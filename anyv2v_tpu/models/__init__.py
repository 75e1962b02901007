from .clip import (
    CLIPTextConfig,
    CLIPTextModel,
    CLIPVisionConfig,
    CLIPVisionModel,
    preprocess_clip_image,
)
from .controlnet import ControlNet, ControlNetConditioningEmbedding
from .unet_i2vgen import I2VGenUNet, I2VGenUNetConfig, PnPFlags
from .unet_sd import SD15_IP2P, SDXL_COSXL, SDUNet, SDUNetConfig
from .unet_seine import SeinePnPFlags, SeineUNet, SeineUNetConfig
from .unet_videoldm import VideoLDMUNet, VideoLDMUNetConfig
from .vae import AutoencoderKL, VAEConfig, sample_from_moments

__all__ = [
    "AutoencoderKL",
    "CLIPTextConfig",
    "CLIPTextModel",
    "CLIPVisionConfig",
    "CLIPVisionModel",
    "ControlNet",
    "ControlNetConditioningEmbedding",
    "I2VGenUNet",
    "I2VGenUNetConfig",
    "PnPFlags",
    "SD15_IP2P",
    "SDXL_COSXL",
    "SDUNet",
    "SDUNetConfig",
    "SeinePnPFlags",
    "SeineUNet",
    "SeineUNetConfig",
    "VAEConfig",
    "VideoLDMUNet",
    "VideoLDMUNetConfig",
    "preprocess_clip_image",
    "sample_from_moments",
]
