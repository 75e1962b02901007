from .i2vgen import I2VGenPipeline, PnPConfig

__all__ = ["I2VGenPipeline", "PnPConfig"]
