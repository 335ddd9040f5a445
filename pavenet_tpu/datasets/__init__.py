from .coco_api import COCO
from .posetrack import PosetrackVideoPoseDataset
from .coco_pose import CocoPoseDataset, CocoVideoPoseDataset
from .extra import (CrowdPoseDataset, PosetrackPoseDataset,
                    Objects365Dataset)
from .loader import ClipLoader, pad_gt

__all__ = [
    "COCO", "PosetrackVideoPoseDataset", "CocoPoseDataset",
    "CocoVideoPoseDataset", "CrowdPoseDataset", "PosetrackPoseDataset",
    "Objects365Dataset", "ClipLoader", "pad_gt",
]
