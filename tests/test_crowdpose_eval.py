"""CrowdPose protocol evaluation (xtcocotools ``keypoints_crowd``):
use_area=False OKS + crowd-index AP(E)/AP(M)/AP(H) bands (reference
``opera/datasets/crowd_pose.py:286-295``; published PETR CrowdPose
numbers are in this protocol, ``configs/petr/README.md:16-19``).

Differential tests on synthetic annotations with hand-computed OKS and
band membership (no xtcocotools in this environment).
"""
import numpy as np

from pavenet_tpu.datasets.coco_api import COCO
from pavenet_tpu.core.eval.coco_keypoint_eval import (
    COCOKeypointEval, CrowdPoseKeypointEval)
from pavenet_tpu.models.losses.oks_loss import OKS_SIGMAS

K = 14
BOX_W, BOX_H = 90.0, 120.0


def make_gt(crowd_indices, persons_per_img=2, seed=0):
    """One image per crowdIndex value."""
    rng = np.random.RandomState(seed)
    images, anns = [], []
    aid = 1
    for i, ci in enumerate(crowd_indices, start=1):
        images.append(dict(id=i, file_name=f"{i}.jpg", width=640,
                           height=480, crowdIndex=float(ci)))
        for _ in range(persons_per_img):
            k = np.zeros((K, 3))
            k[:, 0] = rng.uniform(100, 540, K)
            k[:, 1] = rng.uniform(100, 380, K)
            k[:, 2] = 2
            anns.append(dict(
                id=aid, image_id=i, category_id=1,
                keypoints=k.reshape(-1).tolist(),
                # deliberately inconsistent area: the crowd protocol must
                # use bbox w*h*0.53, never this field
                area=7.0,
                bbox=[50, 50, BOX_W, BOX_H],
                num_keypoints=K, iscrowd=0))
            aid += 1
    return COCO(dataset=dict(images=images, annotations=anns,
                             categories=[dict(id=1, name="person")]))


def dets_from_gt(gt, img_offsets, score=0.9):
    """Per-image constant keypoint offset (hand-computable OKS)."""
    dets = []
    for ann in gt.anns.values():
        dx = img_offsets.get(ann["image_id"], 0.0)
        k = np.asarray(ann["keypoints"], float).reshape(-1, 3)
        k[:, 0] += dx
        dets.append(dict(image_id=ann["image_id"], category_id=1,
                         keypoints=k.reshape(-1).tolist(), score=score))
    return dets


def expected_oks(dx):
    """xtcocotools computeOks with use_area=False: scale = w*h*0.53."""
    var = (OKS_SIGMAS[14] * 2.0) ** 2
    scale = BOX_W * BOX_H * 0.53
    e = dx ** 2 / var / (scale + np.spacing(1)) / 2
    return float(np.mean(np.exp(-e)))


def test_use_area_false_oks_hand_computed():
    """AP = fraction of IoU thresholds the hand-computed OKS clears."""
    gt = make_gt([0.5], persons_per_img=1)
    dx = 10.0
    oks = expected_oks(dx)
    assert 0.5 < oks < 0.95  # offset chosen to land strictly inside
    dt = gt.load_res(dets_from_gt(gt, {1: dx}))
    res = CrowdPoseKeypointEval(gt, dt).evaluate()
    thrs = np.linspace(0.5, 0.95, 10)
    want = float((thrs <= oks).mean())
    assert res["AP"] == want, (res["AP"], want, oks)
    # the plain COCO evaluator on the same data uses gt['area']=7 ->
    # different (much lower) OKS; the protocols must not coincide
    coco = COCOKeypointEval(gt, dt, sigmas=OKS_SIGMAS[14],
                            max_dets=20).evaluate()
    assert coco["AP"] < res["AP"]


def test_crowd_bands_hand_membership():
    """Band membership: easy < 0.1, medium [0.1, 0.8], hard > 0.8
    (xtcocotools ``get_type_result(first=0.1, second=0.8)`` split)."""
    # 2 easy (0.0, 0.09), 3 medium (0.1, 0.5, 0.8), 1 hard (0.81)
    cis = [0.0, 0.09, 0.1, 0.5, 0.8, 0.81]
    gt = make_gt(cis)
    easy, mid, hard = CrowdPoseKeypointEval(
        gt, gt.load_res(dets_from_gt(gt, {}))) ._crowd_bands()
    assert easy == [1, 2] and mid == [3, 4, 5] and hard == [6]

    # perfect on easy, miss-by-10px on medium, 200px (zero OKS) on hard
    offsets = {1: 0.0, 2: 0.0, 3: 10.0, 4: 10.0, 5: 10.0, 6: 200.0}
    dt = gt.load_res(dets_from_gt(gt, offsets))
    res = CrowdPoseKeypointEval(gt, dt).evaluate()
    thrs = np.linspace(0.5, 0.95, 10)
    oks_mid = expected_oks(10.0)
    assert res["AP(E)"] == 1.0
    assert res["AP(M)"] == float((thrs <= oks_mid).mean())
    assert res["AP(H)"] == 0.0
    for k in ("AP", "AP50", "AP75", "AR", "AR50", "AR75"):
        assert k in res and np.isfinite(res[k])
    # pooled AP sits strictly between the hard and easy bands
    assert res["AP(H)"] < res["AP"] < res["AP(E)"]


def test_dataset_dispatch():
    """evaluate_dataset routes CrowdPoseDataset through the crowd
    protocol and emits the reference's keypoints_AP(E|M|H) keys."""
    from pavenet_tpu.apis.test import evaluate_dataset

    gt = make_gt([0.0, 0.5, 0.9])
    dets = dets_from_gt(gt, {})

    class _DS:
        coco = gt
        NUM_KEYPOINTS = 14
        EVAL_PROTOCOL = "crowdpose"

    res = evaluate_dataset(_DS(), dets)
    for k in ("keypoints_AP", "keypoints_AP(E)", "keypoints_AP(M)",
              "keypoints_AP(H)", "keypoints_AR"):
        assert k in res, sorted(res)
    assert res["keypoints_AP"] == 1.0
    assert res["keypoints_AP(E)"] == 1.0
