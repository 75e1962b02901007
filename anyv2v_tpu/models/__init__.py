from .unet_i2vgen import I2VGenUNet, I2VGenUNetConfig, PnPFlags

__all__ = ["I2VGenUNet", "I2VGenUNetConfig", "PnPFlags"]
