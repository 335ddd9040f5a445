from .coco_api import COCO
from .posetrack import PosetrackVideoPoseDataset
from .coco_pose import CocoPoseDataset, CocoVideoPoseDataset
from .loader import ClipLoader, pad_gt

__all__ = [
    "COCO", "PosetrackVideoPoseDataset", "CocoPoseDataset",
    "CocoVideoPoseDataset", "ClipLoader", "pad_gt",
]
