"""Hand-computable scenarios for the PoseTrack AP port."""
import numpy as np

from pavenet_tpu.core.eval.posetrack_eval import (
    evaluate_posetrack_ap, NUM_JOINTS)


def make_frame(rng, num_poses=2, noise=0.0, drop_pred=0,
               extra_fp=0, fp_score=0.1):
    J = NUM_JOINTS
    gt = np.zeros((num_poses, J, 3))
    heads = np.zeros((num_poses, 4))
    for p in range(num_poses):
        cx, cy = rng.uniform(200, 800), rng.uniform(200, 600)
        gt[p, :, 0] = cx + rng.uniform(-50, 50, J)
        gt[p, :, 1] = cy + rng.uniform(-80, 80, J)
        gt[p, :, 2] = 1
        heads[p] = [cx - 20, cy - 100, cx + 20, cy - 60]  # 40x40 head
    n_pred = num_poses - drop_pred
    pr = gt[:n_pred, :, :2] + rng.randn(n_pred, J, 2) * noise
    scores = np.full((n_pred, J), 0.9) + rng.rand(n_pred, J) * 0.05
    if extra_fp:
        fp = rng.uniform(0, 100, (extra_fp, J, 2))  # far from everything
        pr = np.concatenate([pr, fp]) if n_pred else fp
        scores = np.concatenate(
            [scores, np.full((extra_fp, J), fp_score)])
    return dict(gt_points=gt, gt_head_boxes=heads, pr_points=pr,
                pr_scores=scores, pr_valid=np.ones(scores.shape, bool))


def test_perfect_ap100():
    rng = np.random.RandomState(0)
    frames = [make_frame(rng) for _ in range(5)]
    res = evaluate_posetrack_ap(frames)
    assert abs(res["Mean"] - 100.0) < 1e-6
    for k in ("Head", "Shoulder", "Ankle"):
        assert abs(res[k] - 100.0) < 1e-6


def test_half_recall_ap50():
    rng = np.random.RandomState(1)
    frames = [make_frame(rng, num_poses=2, drop_pred=1) for _ in range(6)]
    res = evaluate_posetrack_ap(frames)
    assert abs(res["Mean"] - 50.0) < 1e-6


def test_low_score_fp_harmless_high_score_fp_hurts():
    rng = np.random.RandomState(2)
    frames = [make_frame(rng, extra_fp=1, fp_score=0.1) for _ in range(4)]
    res_low = evaluate_posetrack_ap(frames)
    assert abs(res_low["Mean"] - 100.0) < 1e-6
    rng = np.random.RandomState(2)
    frames = [make_frame(rng, extra_fp=1, fp_score=0.99) for _ in range(4)]
    res_high = evaluate_posetrack_ap(frames)
    assert res_high["Mean"] < 100.0


def test_pckh_threshold():
    # displacement just inside / outside 0.5 * headSize
    rng = np.random.RandomState(3)
    J = NUM_JOINTS
    gt = np.zeros((1, J, 3))
    gt[0, :, 0] = np.linspace(100, 400, J)
    gt[0, :, 1] = 300
    gt[0, :, 2] = 1
    heads = np.array([[0, 0, 30, 40]])  # diag 50 -> headSize 30, thr 15
    for offset, expect in ((14.0, 100.0), (16.0, 0.0)):
        pr = gt[:, :, :2].copy()
        pr[..., 0] += offset
        frame = dict(gt_points=gt, gt_head_boxes=heads, pr_points=pr,
                     pr_scores=np.ones((1, J)),
                     pr_valid=np.ones((1, J), bool))
        res = evaluate_posetrack_ap([frame])
        assert abs(res["Mean"] - expect) < 1e-6, (offset, res["Mean"])
