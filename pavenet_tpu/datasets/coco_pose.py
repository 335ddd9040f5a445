"""COCO keypoint datasets (single-frame and fake-clip video pretraining).

Rebuilds ``opera/datasets/coco_pose.py`` (17-keypoint single frame) and
``opera/datasets/coco_video_pose.py`` (one static image replicated into a
T-frame clip to pretrain the video model on COCO — stage 2 of the
reference's 3-stage recipe, SURVEY.md Appendix C).
"""
from __future__ import annotations

import os.path as osp

import numpy as np

from ..registry import DATASETS
from .coco_api import COCO

COCO_FLIP_PAIRS = ((1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12),
                   (13, 14), (15, 16))


@DATASETS.register_module()
class CocoPoseDataset:
    CLASSES = ("person",)
    FLIP_PAIRS = COCO_FLIP_PAIRS
    NUM_KEYPOINTS = 17
    # which dataset.evaluate protocol applies (reference dispatches by
    # dataset class; ``posetrack`` adds the poseval per-joint AP chain)
    EVAL_PROTOCOL = "coco"

    num_frames = 1

    def __init__(self, ann_file: str, img_prefix: str = "", pipeline=None,
                 test_mode: bool = False, min_keypoints: int = 1, **kwargs):
        self.coco = COCO(ann_file)
        self.img_prefix = img_prefix
        self.pipeline = pipeline
        self.test_mode = test_mode
        self.min_keypoints = min_keypoints
        self.data_infos = self._load_infos()

    def _load_infos(self):
        infos = []
        for img_id in self.coco.get_img_ids():
            info = dict(self.coco.load_imgs([img_id])[0])
            anns = self.coco.img_to_anns[img_id]
            has_kpts = any(
                a.get("num_keypoints", 0) >= self.min_keypoints
                and not a.get("iscrowd", 0) for a in anns)
            if self.test_mode or has_kpts:
                infos.append(info)
        return infos

    def __len__(self):
        return len(self.data_infos)

    def get_ann(self, idx):
        info = self.data_infos[idx]
        kpts, areas, bboxes = [], [], []
        for ann in self.coco.img_to_anns[info["id"]]:
            if ann.get("iscrowd", 0):
                continue
            if ann.get("num_keypoints", 0) < self.min_keypoints:
                continue
            k = np.asarray(ann["keypoints"], np.float32).reshape(-1, 3)
            x, y, w, h = ann.get("bbox", [0, 0, 0, 0])
            kpts.append(k)
            areas.append(ann.get("area", w * h))
            bboxes.append([x, y, x + w, y + h])
        K = self.NUM_KEYPOINTS
        return dict(
            keypoints=(np.stack(kpts) if kpts
                       else np.zeros((0, K, 3), np.float32)),
            areas=np.asarray(areas, np.float32),
            bboxes=(np.asarray(bboxes, np.float32) if bboxes
                    else np.zeros((0, 4), np.float32)),
            labels=np.zeros((len(kpts),), np.int64),
        )

    def _frame_files(self, info):
        return [osp.join(self.img_prefix, info["file_name"])]

    def __getitem__(self, idx):
        info = self.data_infos[idx]
        ann = self.get_ann(idx)
        results = dict(
            img_info=info,
            image_id=info["id"],
            frame_files=self._frame_files(info) * self.num_frames,
            gt_keypoints=ann["keypoints"],
            gt_areas=ann["areas"],
            gt_bboxes=ann["bboxes"],
            gt_labels=ann["labels"],
            flip_pairs=self.FLIP_PAIRS,
        )
        if self.pipeline is not None:
            results = self.pipeline(results)
        return results


@DATASETS.register_module(name=["CocoVideoPoseDataset",
                                "CocoVideoPoseDatasetV2"])
class CocoVideoPoseDataset(CocoPoseDataset):
    """Fake-clip COCO: the single image stands in for all T frames
    (reference ``mmdet/datasets/pipelines/loading.py:319,435``)."""

    def __init__(self, *args, num_frames: int = 3, **kwargs):
        self.num_frames = num_frames
        super().__init__(*args, **kwargs)
