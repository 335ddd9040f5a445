"""Tests for the DK-DETR transfer-eval stack: VOC mAP (differential vs
the vendored mmdet ``eval_map``), LVIS federated evaluation semantics,
the VOC xml dataset, LVIS v1 loading quirks and repeat-factor sampling."""
import json
import os
import sys

import numpy as np
import pytest

from pavenet_tpu.core.eval.voc_eval import eval_voc_map
from pavenet_tpu.core.eval.lvis_eval import LVISDetEval
from pavenet_tpu.datasets.coco_api import COCO

J = 15


# ---------------------------------------------------------------------
# VOC mAP differential vs vendored mmdet eval_map
# ---------------------------------------------------------------------
@pytest.fixture(scope="module")
def mmdet_eval_map():
    from reference_oracle import install_stubs, REFERENCE_ROOT
    install_stubs()
    sys.path.insert(0, f"{REFERENCE_ROOT}/third_party/mmdetection")
    from mmdet.core.evaluation.mean_ap import eval_map
    return eval_map


def _rand_det_dataset(rng, n_imgs=8, n_classes=4):
    """Synthetic detection GT + results in both formats."""
    gts, det_results, annotations = [], [], []
    detections = []
    for i in range(n_imgs):
        G = rng.randint(0, 5)
        boxes, labels, difficult = [], [], []
        for _ in range(G):
            x1, y1 = rng.uniform(0, 150, 2)
            w, h = rng.uniform(20, 60, 2)
            boxes.append([x1, y1, x1 + w, y1 + h])
            labels.append(rng.randint(n_classes))
            difficult.append(rng.rand() < 0.2)
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        labels = np.asarray(labels, np.int64)
        difficult = np.asarray(difficult, bool)
        gts.append(dict(bboxes=boxes, labels=labels, difficult=difficult))
        annotations.append(dict(
            bboxes=boxes[~difficult], labels=labels[~difficult],
            bboxes_ignore=boxes[difficult],
            labels_ignore=labels[difficult]))
        per_class = [[] for _ in range(n_classes)]
        P = rng.randint(0, 8)
        for _ in range(P):
            c = rng.randint(n_classes)
            if G and rng.rand() < 0.7:
                g = rng.randint(G)
                b = boxes[g] + rng.randn(4) * 6
                b[2:] = np.maximum(b[2:], b[:2] + 5)
            else:
                x1, y1 = rng.uniform(0, 150, 2)
                w, h = rng.uniform(20, 60, 2)
                b = np.array([x1, y1, x1 + w, y1 + h])
            s = rng.rand()
            per_class[c].append([*b, s])
            detections.append(dict(
                image_id=i, category_id=c + 1,
                bbox=[b[0], b[1], b[2] - b[0], b[3] - b[1]],
                score=float(s)))
        det_results.append([np.asarray(p, np.float32).reshape(-1, 5)
                            for p in per_class])
    return gts, annotations, det_results, detections


@pytest.mark.parametrize("seed,iou_thr", [(0, 0.5), (1, 0.5), (2, 0.75)])
def test_voc_map_matches_mmdet(mmdet_eval_map, seed, iou_thr):
    rng = np.random.RandomState(seed)
    gts, annotations, det_results, detections = _rand_det_dataset(rng)
    want, _ = mmdet_eval_map(det_results, annotations, iou_thr=iou_thr,
                             dataset="voc07", logger="silent")
    got = eval_voc_map(gts, detections, num_classes=4, iou_thr=iou_thr,
                       use_07_metric=True)
    assert abs(got - want) < 1e-6, (got, want)


def test_voc_map_area_metric_matches_mmdet(mmdet_eval_map):
    rng = np.random.RandomState(7)
    gts, annotations, det_results, detections = _rand_det_dataset(rng)
    want, _ = mmdet_eval_map(det_results, annotations, iou_thr=0.5,
                             logger="silent")  # default 'area' mode
    got = eval_voc_map(gts, detections, num_classes=4, iou_thr=0.5,
                       use_07_metric=False)
    assert abs(got - want) < 1e-6, (got, want)


# ---------------------------------------------------------------------
# VOC xml dataset
# ---------------------------------------------------------------------
def test_voc_dataset_parses_xml(tmp_path):
    from pavenet_tpu.datasets.extra import VOCDataset
    root = tmp_path / "VOC2007"
    (root / "Annotations").mkdir(parents=True)
    (root / "ImageSets" / "Main").mkdir(parents=True)
    (root / "ImageSets" / "Main" / "test.txt").write_text(
        "000001\n000002\n")
    for stem, objs in (("000001", [("dog", 48, 240, 195, 371, 0),
                                   ("person", 8, 12, 352, 498, 1)]),
                       ("000002", [("car", 139, 200, 207, 301, 0)])):
        body = "".join(
            f"<object><name>{n}</name><difficult>{d}</difficult>"
            f"<bndbox><xmin>{a}</xmin><ymin>{b}</ymin>"
            f"<xmax>{c}</xmax><ymax>{e}</ymax></bndbox></object>"
            for n, a, b, c, e, d in objs)
        (root / "Annotations" / f"{stem}.xml").write_text(
            f"<annotation>{body}</annotation>")
    ds = VOCDataset(ann_file=str(root / "ImageSets/Main/test.txt"),
                    img_prefix=str(root), test_mode=True)
    assert len(ds) == 2 and ds.year == 2007
    ann = ds.get_ann(0)
    assert ann["bboxes"].shape == (2, 4)
    # 1-indexed xml -> 0-indexed boxes
    np.testing.assert_allclose(ann["bboxes"][0], [47, 239, 194, 370])
    assert ann["labels"].tolist() == [
        VOCDataset.CLASSES.index("dog"), VOCDataset.CLASSES.index("person")]
    assert ann["difficult"].tolist() == [False, True]
    # perfect detections on the non-difficult boxes -> mAP 100
    dets = []
    for i in range(2):
        a = ds.get_ann(i)
        for b, l, d in zip(a["bboxes"], a["labels"], a["difficult"]):
            if not d:
                dets.append(dict(image_id=i, category_id=int(l) + 1,
                                 bbox=[float(b[0]), float(b[1]),
                                       float(b[2] - b[0]),
                                       float(b[3] - b[1])],
                                 score=0.9))
    res = ds.evaluate_detections(dets, iou_thr=[0.5, 0.75])
    assert abs(res["mAP50"] - 1.0) < 1e-9
    assert abs(res["mAP75"] - 1.0) < 1e-9


# ---------------------------------------------------------------------
# LVIS federated evaluation semantics
# ---------------------------------------------------------------------
def _lvis_gt():
    """3 images, 3 categories with distinct frequency bands.

    img 1: cat1 GT; cat2 verified absent; cat3 unverified.
    img 2: cat2 GT (not exhaustive); cat3 verified absent.
    img 3: cat3 GT.
    """
    return COCO(dataset=dict(
        images=[
            dict(id=1, width=100, height=100, neg_category_ids=[2],
                 not_exhaustive_category_ids=[]),
            dict(id=2, width=100, height=100, neg_category_ids=[3],
                 not_exhaustive_category_ids=[2]),
            dict(id=3, width=100, height=100, neg_category_ids=[],
                 not_exhaustive_category_ids=[]),
        ],
        annotations=[
            dict(id=1, image_id=1, category_id=1, bbox=[10, 10, 20, 20],
                 area=400.0),
            dict(id=2, image_id=2, category_id=2, bbox=[30, 30, 20, 20],
                 area=400.0),
            dict(id=3, image_id=3, category_id=3, bbox=[50, 50, 20, 20],
                 area=400.0),
        ],
        categories=[dict(id=1, name="a", frequency="r"),
                    dict(id=2, name="b", frequency="c"),
                    dict(id=3, name="c", frequency="f")]))


def _det(img, cat, bbox, score):
    return dict(image_id=img, category_id=cat, bbox=list(bbox),
                score=score, area=float(bbox[2] * bbox[3]))


def test_lvis_federated_gating():
    gt = _lvis_gt()
    # perfect det per GT + a cat3 FP on img1 where cat3 is UNVERIFIED
    # (must be dropped) + a cat2 FP on img1 where cat2 is verified absent
    # (must count as FP)
    dets = [
        _det(1, 1, (10, 10, 20, 20), 0.9),
        _det(2, 2, (30, 30, 20, 20), 0.9),
        _det(3, 3, (50, 50, 20, 20), 0.9),
    ]
    dt = gt.load_res(dets)
    base = LVISDetEval(gt, dt, iou_type="bbox").evaluate()
    assert abs(base["AP"] - 1.0) < 1e-9

    # unverified-image detection: ignored entirely -> AP unchanged
    dt = gt.load_res(dets + [_det(1, 3, (70, 70, 20, 20), 0.95)])
    res = LVISDetEval(gt, dt, iou_type="bbox").evaluate()
    assert abs(res["AP"] - 1.0) < 1e-9

    # verified-absent detection: counts as FP -> cat2 AP drops
    dt = gt.load_res(dets + [_det(1, 2, (70, 70, 20, 20), 0.95)])
    res = LVISDetEval(gt, dt, iou_type="bbox").evaluate()
    assert res["AP"] < 1.0
    assert res["AP_c"] < 1.0 - 1e-9          # cat2 is the 'common' band
    assert abs(res["AP_r"] - 1.0) < 1e-9
    assert abs(res["AP_f"] - 1.0) < 1e-9


def test_lvis_not_exhaustive_ignores_unmatched():
    gt = _lvis_gt()
    dets = [
        _det(1, 1, (10, 10, 20, 20), 0.9),
        _det(2, 2, (30, 30, 20, 20), 0.9),
        _det(3, 3, (50, 50, 20, 20), 0.9),
        # extra unmatched cat2 det on img2, where cat2 is flagged
        # not-exhaustive -> ignored, not an FP
        _det(2, 2, (70, 70, 20, 20), 0.95),
    ]
    res = LVISDetEval(gt, gt.load_res(dets), iou_type="bbox").evaluate()
    assert abs(res["AP"] - 1.0) < 1e-9


def test_lvis_max_dets_default():
    gt = _lvis_gt()
    e = LVISDetEval(gt, gt.load_res([_det(1, 1, (10, 10, 20, 20), 0.9)]))
    assert e.max_dets == 300


# ---------------------------------------------------------------------
# LVIS v1 dataset loading + ClassBalancedDataset
# ---------------------------------------------------------------------
def _lvis_json(tmp_path, n_rare=1, n_common=12):
    imgs, anns = [], []
    aid = 0
    total = n_rare + n_common
    for i in range(1, total + 1):
        imgs.append(dict(
            id=i, width=64, height=64,
            coco_url=f"http://images.cocodataset.org/train2017/"
                     f"{i:012d}.jpg",
            neg_category_ids=[], not_exhaustive_category_ids=[]))
        aid += 1
        cat = 1 if i <= n_rare else 2
        anns.append(dict(id=aid, image_id=i, category_id=cat,
                         bbox=[4, 4, 16, 16], area=256.0,
                         segmentation=[[4, 4, 20, 4, 20, 20, 4, 20]]))
    data = dict(images=imgs, annotations=anns,
                categories=[dict(id=1, name="rare_thing", frequency="r"),
                            dict(id=2, name="common_thing",
                                 frequency="c")])
    p = tmp_path / "lvis_v1_train.json"
    p.write_text(json.dumps(data))
    return p


def test_lvis_dataset_and_class_balanced(tmp_path):
    from pavenet_tpu.datasets.extra import (LVISV1Dataset,
                                            ClassBalancedDataset)
    ann = _lvis_json(tmp_path)
    ds = LVISV1Dataset(ann_file=str(ann), img_prefix="imgs/")
    assert len(ds) == 13
    # file_name derived from coco_url
    assert ds.data_infos[0]["file_name"] == "train2017/000000000001.jpg"
    assert ds.get_cat_ids(0) == [1]

    # repeat factors: f(rare)=1/13 -> r = sqrt(0.5/(1/13)) = sqrt(6.5)
    wrapped = ClassBalancedDataset(ds, oversample_thr=0.5)
    import math
    want_rare = math.ceil(math.sqrt(0.5 / (1 / 13)))
    want_common = math.ceil(max(1.0, math.sqrt(0.5 / (12 / 13))))
    assert wrapped.repeat_indices.count(0) == want_rare
    assert wrapped.repeat_indices.count(1) == want_common
    assert len(wrapped) == want_rare + 12 * want_common
    # wrapper builds nested dataset dicts too
    wrapped2 = ClassBalancedDataset(
        dict(type="LVISV1Dataset", ann_file=str(ann), img_prefix="imgs/"),
        oversample_thr=0.5)
    assert len(wrapped2) == len(wrapped)
