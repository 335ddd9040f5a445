"""COCO bbox/segm mAP evaluator tests on hand-computable cases
(SOIT's metric; reference ``configs/soit/README.md:8-10``)."""
import numpy as np

from pavenet_tpu.core.eval.coco_det_eval import (
    COCODetEval, _bbox_iou, polys_to_mask)
from pavenet_tpu.datasets.coco_api import COCO


def _gt_index(anns, imgs):
    return COCO(dataset=dict(
        images=imgs,
        annotations=anns,
        categories=[dict(id=1, name="a"), dict(id=2, name="b")]))


def test_bbox_iou_crowd_semantics():
    iou = _bbox_iou([[0, 0, 10, 10]], [[0, 0, 20, 20]], [0])
    assert abs(iou[0, 0] - 100 / 400) < 1e-9
    iou = _bbox_iou([[0, 0, 10, 10]], [[0, 0, 20, 20]], [1])
    assert abs(iou[0, 0] - 1.0) < 1e-9  # crowd: inter / dt area


def test_polys_to_mask():
    m = polys_to_mask([[0, 0, 4, 0, 4, 4, 0, 4]], 8, 8)
    assert m[:4, :4].all() and not m[6:, 6:].any()


def test_perfect_detections_ap1():
    imgs = [dict(id=1, height=100, width=100)]
    anns = [dict(id=1, image_id=1, category_id=1, bbox=[10, 10, 40, 40],
                 area=1600, iscrowd=0),
            dict(id=2, image_id=1, category_id=2, bbox=[60, 60, 20, 20],
                 area=400, iscrowd=0)]
    gt = _gt_index(anns, imgs)
    dts = [dict(id=1, image_id=1, category_id=1, bbox=[10, 10, 40, 40],
                area=1600, score=0.9),
           dict(id=2, image_id=1, category_id=2, bbox=[60, 60, 20, 20],
                area=400, score=0.8)]
    dt = gt.load_res(dts)
    res = COCODetEval(gt, dt, iou_type="bbox").evaluate()
    assert abs(res["AP"] - 1.0) < 1e-6
    assert abs(res["AP50"] - 1.0) < 1e-6


def test_false_positive_halves_precision():
    imgs = [dict(id=1, height=100, width=100)]
    anns = [dict(id=1, image_id=1, category_id=1, bbox=[10, 10, 40, 40],
                 area=1600, iscrowd=0)]
    gt = _gt_index(anns, imgs)
    # one perfect hit (higher score) + one far miss
    dts = [dict(id=1, image_id=1, category_id=1, bbox=[10, 10, 40, 40],
                area=1600, score=0.9),
           dict(id=2, image_id=1, category_id=1, bbox=[70, 70, 10, 10],
                area=100, score=0.5)]
    dt = gt.load_res(dts)
    res = COCODetEval(gt, dt, iou_type="bbox").evaluate()
    # recall hits 1.0 at the first det; the trailing FP doesn't reduce the
    # interpolated AP
    assert abs(res["AP"] - 1.0) < 1e-6
    # flip score order: now the FP ranks first -> precision at recall 1.0
    # is 0.5 for every threshold
    dts[0]["score"], dts[1]["score"] = 0.5, 0.9
    dt = gt.load_res(dts)
    res = COCODetEval(gt, dt, iou_type="bbox").evaluate()
    expect = np.mean([1.0 if r == 0 else 0.5
                      for r in np.linspace(0, 1, 101)])
    assert abs(res["AP"] - expect) < 1e-2


def test_mask_ap_with_shifted_mask():
    imgs = [dict(id=1, height=64, width=64)]
    anns = [dict(id=1, image_id=1, category_id=1,
                 segmentation=[[0, 0, 32, 0, 32, 32, 0, 32]],
                 bbox=[0, 0, 32, 32], area=1024, iscrowd=0)]
    gt = _gt_index(anns, imgs)
    # detection mask = same square shifted so IoU ~ (24*32)/(40*32) = 0.6
    m = np.zeros((64, 64), bool)
    m[0:32, 8:40] = True
    dts = [dict(id=1, image_id=1, category_id=1, segmentation=m,
                bbox=[8, 0, 32, 32], area=1024, score=0.9)]
    dt = gt.load_res(dts)
    res = COCODetEval(gt, dt, iou_type="segm").evaluate()
    # matched at thresholds 0.5, 0.55, 0.6 -> AP = 2-3/10 of perfect
    assert 0.15 < res["AP"] < 0.35
    assert abs(res["AP50"] - 1.0) < 1e-6
    assert res["AP75"] == 0.0
