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
    # xtcocotools 'keypoints_crowd' protocol: use_area=False OKS +
    # crowd-index AP(E)/AP(M)/AP(H) bands (reference
    # ``opera/datasets/crowd_pose.py:286-295``)
    EVAL_PROTOCOL = "crowdpose"


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


@DATASETS.register_module(name=["LVISV1Dataset", "LVISDataset"])
class LVISV1Dataset(CocoInstanceDataset):
    """LVIS v1 federated instance dataset (reference
    ``configs/_base_/datasets/lvis_v1_instance.py`` via
    ``mmdet.LVISV1Dataset``).  LVIS v1 image records carry no
    ``file_name`` — it derives from ``coco_url`` — plus the federated
    annotation fields ``neg_category_ids`` /
    ``not_exhaustive_category_ids`` consumed by the LVIS evaluator."""

    def _load_infos(self):
        infos = []
        for img_id in self.coco.get_img_ids():
            info = dict(self.coco.load_imgs([img_id])[0])
            if "file_name" not in info and "coco_url" in info:
                info["file_name"] = "/".join(
                    info["coco_url"].split("/")[-2:])
            anns = self.coco.img_to_anns.get(info["id"], [])
            if self.test_mode or anns:
                infos.append(info)
        return infos

    def get_cat_ids(self, idx):
        info = self.data_infos[idx]
        return [a["category_id"]
                for a in self.coco.img_to_anns.get(info["id"], [])]

    def evaluate_detections(self, detections, metrics=None):
        """LVIS protocol evaluation (maxDets=300, federated gating,
        frequency-band APr/APc/APf)."""
        from collections import OrderedDict
        from ..core.eval.lvis_eval import LVISDetEval
        if metrics is None:
            metrics = (("bbox", "segm")
                       if detections and "segmentation" in detections[0]
                       else ("bbox",))
        results = OrderedDict()
        dt = self.coco.load_res(detections)
        for metric in metrics:
            res = LVISDetEval(self.coco, dt, iou_type=metric).evaluate()
            results.update({f"{metric}/{k}": v for k, v in res.items()})
        return results


@DATASETS.register_module()
class ClassBalancedDataset:
    """Repeat-factor oversampling wrapper (mmdet ``ClassBalancedDataset``,
    ``third_party/mmdetection/mmdet/datasets/dataset_wrappers.py:211``;
    LVIS paper): r(c) = max(1, sqrt(thr / f(c))) per category, image
    repeat = ceil(max_c r(c)) over its categories.  Used by the DK-DETR
    LVIS train config (``lvis_v1_instance.py`` oversample_thr=1e-3)."""

    def __init__(self, dataset, oversample_thr: float,
                 filter_empty_gt: bool = True, **kwargs):
        import math
        if isinstance(dataset, dict):
            dataset = DATASETS.build(dataset)
        self.dataset = dataset
        self.oversample_thr = oversample_thr
        self.CLASSES = dataset.CLASSES
        self.NUM_KEYPOINTS = getattr(dataset, "NUM_KEYPOINTS", 0)
        self.EVAL_PROTOCOL = getattr(dataset, "EVAL_PROTOCOL", "coco")
        self.num_frames = getattr(dataset, "num_frames", 1)

        n = len(dataset)
        freq = {}
        per_img_cats = []
        for i in range(n):
            cats = set(dataset.get_cat_ids(i))
            if not cats and not filter_empty_gt:
                cats = {-1}
            per_img_cats.append(cats)
            for c in cats:
                freq[c] = freq.get(c, 0) + 1
        repeat = {c: max(1.0, math.sqrt(oversample_thr / (v / n)))
                  for c, v in freq.items()}
        self.repeat_indices = []
        for i, cats in enumerate(per_img_cats):
            r = max((repeat[c] for c in cats), default=1.0)
            self.repeat_indices.extend([i] * math.ceil(r))

    @property
    def coco(self):
        return self.dataset.coco

    def __len__(self):
        return len(self.repeat_indices)

    def __getitem__(self, idx):
        return self.dataset[self.repeat_indices[idx]]

    def get_ann(self, idx):
        return self.dataset.get_ann(self.repeat_indices[idx])


@DATASETS.register_module()
class VOCDataset:
    """Pascal VOC detection dataset (xml annotations; reference uses
    ``mmdet.VOCDataset`` for the DK-DETR VOC transfer evaluation,
    ``configs/dk-detr/dkd_r50_70e_test_voc.py``).  ``ann_file`` is an
    ImageSets split list; annotations load from ``img_prefix/Annotations``.
    """
    CLASSES = ("aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
               "car", "cat", "chair", "cow", "diningtable", "dog", "horse",
               "motorbike", "person", "pottedplant", "sheep", "sofa",
               "train", "tvmonitor")
    NUM_KEYPOINTS = 0
    EVAL_PROTOCOL = "voc"
    num_frames = 1

    def __init__(self, ann_file: str, img_prefix: str = "", pipeline=None,
                 test_mode: bool = False, **kwargs):
        import os.path as osp
        self.img_prefix = img_prefix
        self.pipeline = pipeline
        self.test_mode = test_mode
        # VOC2007 ("area" vs "11points" metric keys off the year in mmdet)
        self.year = 2007 if "VOC2007" in (img_prefix or ann_file) else 2012
        with open(ann_file) as f:
            self.ids = [line.strip() for line in f if line.strip()]
        self.data_infos = [
            dict(id=i, stem=s,
                 file_name=osp.join("JPEGImages", s + ".jpg"),
                 xml=osp.join(img_prefix, "Annotations", s + ".xml"))
            for i, s in enumerate(self.ids)]

    def __len__(self):
        return len(self.data_infos)

    def get_ann(self, idx):
        import xml.etree.ElementTree as ET
        info = self.data_infos[idx]
        cat2label = {c: i for i, c in enumerate(self.CLASSES)}
        boxes, labels, difficult = [], [], []
        root = ET.parse(info["xml"]).getroot()
        for obj in root.findall("object"):
            name = obj.find("name").text
            if name not in cat2label:
                continue
            bnd = obj.find("bndbox")
            # VOC boxes are 1-indexed inclusive (mmdet XMLDataset -1)
            x1 = float(bnd.find("xmin").text) - 1
            y1 = float(bnd.find("ymin").text) - 1
            x2 = float(bnd.find("xmax").text) - 1
            y2 = float(bnd.find("ymax").text) - 1
            boxes.append([x1, y1, x2, y2])
            labels.append(cat2label[name])
            diff = obj.find("difficult")
            difficult.append(int(diff.text) if diff is not None else 0)
        boxes = (np.asarray(boxes, np.float32) if boxes
                 else np.zeros((0, 4), np.float32))
        return dict(
            keypoints=np.zeros((len(boxes), 0, 3), np.float32),
            areas=((boxes[:, 2] - boxes[:, 0])
                   * (boxes[:, 3] - boxes[:, 1])),
            bboxes=boxes,
            labels=np.asarray(labels, np.int64),
            difficult=np.asarray(difficult, bool),
        )

    def __getitem__(self, idx):
        import os.path as osp
        info = self.data_infos[idx]
        ann = self.get_ann(idx)
        results = dict(
            img_info=info, image_id=info["id"],
            frame_files=[osp.join(self.img_prefix, info["file_name"])],
            gt_bboxes=ann["bboxes"], gt_labels=ann["labels"],
            gt_areas=ann["areas"], gt_keypoints=ann["keypoints"])
        if self.pipeline is not None:
            results = self.pipeline(results)
        return results

    def evaluate_detections(self, detections, iou_thr=(0.5,)):
        """VOC mAP over per-image detection dicts (bbox xywh, score,
        category_id = label+1)."""
        from collections import OrderedDict
        from ..core.eval.voc_eval import eval_voc_map
        gts = [self.get_ann(i) for i in range(len(self))]
        results = OrderedDict()
        if not isinstance(iou_thr, (list, tuple)):
            iou_thr = [iou_thr]
        for thr in iou_thr:
            mp = eval_voc_map(
                gts, detections, num_classes=len(self.CLASSES),
                iou_thr=thr,
                use_07_metric=self.year == 2007)
            results[f"mAP{int(thr * 100)}"] = mp
        return results
