from .unet_fastdiffsr import FastDiffSRUNet, unet_from_config

__all__ = ["FastDiffSRUNet", "unet_from_config"]
