from .consisti2v import ConsistI2VPipeline, guidance_mode, sample_video_noise
from .i2vgen import I2VGenPipeline, PnPConfig
from .image_edit import CosXLEditPipeline, InstructPix2PixPipeline
from .instantstyle import ImageProjModel, InstantStylePipeline, canny_map
from .seine import SeinePipeline, SeinePnPConfig

__all__ = [
    "ConsistI2VPipeline",
    "CosXLEditPipeline",
    "I2VGenPipeline",
    "ImageProjModel",
    "InstantStylePipeline",
    "InstructPix2PixPipeline",
    "PnPConfig",
    "SeinePipeline",
    "SeinePnPConfig",
    "canny_map",
    "guidance_mode",
    "sample_video_noise",
]
