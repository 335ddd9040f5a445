"""Sanity tests for the self-contained COCO keypoint eval."""
import numpy as np

from pavenet_tpu.datasets.coco_api import COCO
from pavenet_tpu.core.eval import COCOKeypointEval


def make_gt(num_imgs=4, persons_per_img=2, K=17, seed=0):
    rng = np.random.RandomState(seed)
    images, anns = [], []
    aid = 1
    for i in range(1, num_imgs + 1):
        images.append(dict(id=i, file_name=f"{i}.jpg", width=640,
                           height=480))
        for _ in range(persons_per_img):
            k = np.zeros((K, 3))
            k[:, 0] = rng.uniform(50, 600, K)
            k[:, 1] = rng.uniform(50, 430, K)
            k[:, 2] = 2
            anns.append(dict(
                id=aid, image_id=i, category_id=1,
                keypoints=k.reshape(-1).tolist(),
                area=90 * 120.0, bbox=[50, 50, 90, 120],
                num_keypoints=K, iscrowd=0))
            aid += 1
    return COCO(dataset=dict(images=images, annotations=anns,
                             categories=[dict(id=1, name="person")]))


def dets_from_gt(gt, noise=0.0, score=0.9, seed=1):
    rng = np.random.RandomState(seed)
    dets = []
    for ann in gt.anns.values():
        k = np.asarray(ann["keypoints"], float).reshape(-1, 3)
        k[:, :2] += rng.randn(*k[:, :2].shape) * noise
        dets.append(dict(image_id=ann["image_id"], category_id=1,
                         keypoints=k.reshape(-1).tolist(),
                         score=score + rng.rand() * 0.05,
                         area=ann["area"]))
    return dets


def test_perfect_detections_ap1():
    gt = make_gt()
    dt = gt.load_res(dets_from_gt(gt, noise=0.0))
    res = COCOKeypointEval(gt, dt, max_dets=20).evaluate()
    assert res["AP"] == 1.0
    assert res["AP50"] == 1.0


def test_missing_detections_lower_ap():
    gt = make_gt()
    dets = dets_from_gt(gt, noise=0.0)[:4]  # only half the persons
    dt = gt.load_res(dets)
    res = COCOKeypointEval(gt, dt, max_dets=20).evaluate()
    assert 0.4 < res["AP"] < 0.6


def test_noisy_between():
    gt = make_gt()
    dt = gt.load_res(dets_from_gt(gt, noise=8.0))
    res = COCOKeypointEval(gt, dt, max_dets=20).evaluate()
    assert 0.0 < res["AP"] < 1.0
    assert res["AP50"] >= res["AP75"]
