from .camera import PinholeCamera, FrameInfo, camera_dataset_norm
from . import synthetic

__all__ = ["PinholeCamera", "FrameInfo", "camera_dataset_norm", "synthetic"]
