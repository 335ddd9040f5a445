"""Additional dataset families from the reference inventory.

- ``CrowdPoseDataset`` (``opera/datasets/crowdpose.py``): 14 keypoints.
- ``PosetrackPoseDataset`` (``opera/datasets/posetrack_pose.py``):
  single-frame PoseTrack (15 keypoints).
- ``Objects365Dataset`` (``opera/datasets/objects365.py``): detection-only
  (DK-DETR transfer evaluation).
"""
from __future__ import annotations

import numpy as np

from ..registry import DATASETS
from .coco_pose import CocoPoseDataset
from .posetrack import POSETRACK_FLIP_PAIRS


@DATASETS.register_module()
class CrowdPoseDataset(CocoPoseDataset):
    CLASSES = ("person",)
    NUM_KEYPOINTS = 14
    FLIP_PAIRS = ((0, 1), (2, 3), (4, 5), (6, 7), (8, 9), (10, 11))


@DATASETS.register_module()
class PosetrackPoseDataset(CocoPoseDataset):
    CLASSES = ("person",)
    NUM_KEYPOINTS = 15
    FLIP_PAIRS = POSETRACK_FLIP_PAIRS
    EVAL_PROTOCOL = "posetrack"

    def _load_infos(self):
        infos = []
        for img_id in self.coco.get_img_ids():
            info = dict(self.coco.load_imgs([img_id])[0])
            if not info.get("is_labeled", True):
                continue
            anns = self.coco.img_to_anns[img_id]
            if self.test_mode or any(
                    a.get("num_keypoints", 0) >= self.min_keypoints
                    and not a.get("iscrowd", 0) for a in anns):
                infos.append(info)
        return infos


@DATASETS.register_module(name=["CocoInstanceDataset", "CocoDataset"])
class CocoInstanceDataset(CocoPoseDataset):
    """COCO 80-class instance annotations (boxes + labels + raw polygon
    segmentations) for SOIT/DK-DETR (reference uses ``mmdet.CocoDataset``
    via ``configs/_base_/datasets/coco_instance.py``)."""
    CLASSES = None  # all categories
    NUM_KEYPOINTS = 0

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("min_keypoints", 0)
        super().__init__(*args, **kwargs)

    def get_ann(self, idx):
        info = self.data_infos[idx]
        boxes, labels, areas, segs = [], [], [], []
        cat2label = {c: i for i, c in enumerate(sorted(
            self.coco.get_cat_ids()))}
        for ann in self.coco.img_to_anns[info["id"]]:
            if ann.get("iscrowd", 0):
                continue
            x, y, w, h = ann.get("bbox", [0, 0, 0, 0])
            boxes.append([x, y, x + w, y + h])
            labels.append(cat2label[ann["category_id"]])
            areas.append(ann.get("area", w * h))
            segs.append(ann.get("segmentation"))
        return dict(
            keypoints=np.zeros((len(boxes), 0, 3), np.float32),
            areas=np.asarray(areas, np.float32),
            bboxes=(np.asarray(boxes, np.float32) if boxes
                    else np.zeros((0, 4), np.float32)),
            labels=np.asarray(labels, np.int64),
            segmentations=segs,
        )


@DATASETS.register_module()
class Objects365Dataset(CocoPoseDataset):
    """Box-only dataset (keypoints fields left empty)."""
    NUM_KEYPOINTS = 0

    def __init__(self, *args, **kwargs):
        kwargs.setdefault("min_keypoints", 0)
        super().__init__(*args, **kwargs)

    def get_ann(self, idx):
        info = self.data_infos[idx]
        boxes, labels, areas = [], [], []
        for ann in self.coco.img_to_anns[info["id"]]:
            if ann.get("iscrowd", 0):
                continue
            x, y, w, h = ann.get("bbox", [0, 0, 0, 0])
            boxes.append([x, y, x + w, y + h])
            labels.append(ann.get("category_id", 1) - 1)
            areas.append(ann.get("area", w * h))
        return dict(
            keypoints=np.zeros((len(boxes), 0, 3), np.float32),
            areas=np.asarray(areas, np.float32),
            bboxes=(np.asarray(boxes, np.float32) if boxes
                    else np.zeros((0, 4), np.float32)),
            labels=np.asarray(labels, np.int64),
        )
