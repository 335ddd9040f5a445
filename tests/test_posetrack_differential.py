"""Differential test of the PoseTrack AP port against the *vendored*
poseval (``/root/reference/opera/core/posetrack_utils/poseval/py/
evaluateAP.py``, pure numpy) on randomized synthetic annolists, plus
hand-computed CLEAR-MOT cases for the MOTA port (the vendored
py-motmetrics is py2-era and does not import on this interpreter)."""
import importlib.util
import sys
import types

import numpy as np
import pytest

from pavenet_tpu.core.eval.posetrack_eval import evaluate_posetrack_ap
from pavenet_tpu.core.eval.posetrack_track_eval import (
    MotAccumulator, evaluate_posetrack_mota)

POSEVAL_DIR = ("/root/reference/opera/core/posetrack_utils/poseval/py")
J = 15


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__path__ = []
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def poseval():
    """Import the vendored evaluateAP with its light deps stubbed."""
    shp = _stub("shapely")
    shp.geometry = _stub("shapely.geometry", Polygon=object, box=None)
    _stub("tabulate", tabulate=lambda *a, **k: "")
    _stub("termcolor", colored=lambda s, *a, **k: s)

    class _click(types.ModuleType):
        """Decorator-shaped stubs so convert.py's CLI wrappers import."""
        @staticmethod
        def command(*a, **k):
            return lambda f: f

        argument = option = command

        class Path:
            def __init__(self, *a, **k):
                pass

    sys.modules.setdefault("click", _click("click"))

    pkg = types.ModuleType("poseval_ref")
    pkg.__path__ = [POSEVAL_DIR]
    sys.modules["poseval_ref"] = pkg
    mods = {}
    for name in ("convert", "eval_helpers", "evaluateAP"):
        spec = importlib.util.spec_from_file_location(
            f"poseval_ref.{name}", f"{POSEVAL_DIR}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"poseval_ref.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods["evaluateAP"]


def _rand_frames(rng, n_frames, max_gt=4, max_pr=5):
    """One synthetic dataset in both formats (poseval annolist + ours)."""
    gt_frames, pr_frames, my_frames = [], [], []
    for _ in range(n_frames):
        G = rng.randint(0, max_gt + 1)
        P = rng.randint(0, max_pr + 1)
        gts, heads = [], []
        gt_rects = []
        for g in range(G):
            joints = rng.rand(J) > 0.3
            if not joints.any():
                joints[rng.randint(J)] = True
            pts = np.zeros((J, 3))
            pts[:, 0] = rng.uniform(0, 200, J)
            pts[:, 1] = rng.uniform(0, 200, J)
            pts[:, 2] = joints
            x1, y1 = rng.uniform(0, 180, 2)
            w, h = rng.uniform(10, 40, 2)
            gts.append(pts)
            heads.append([x1, y1, x1 + w, y1 + h])
            gt_rects.append(dict(
                x1=[x1], y1=[y1], x2=[x1 + w], y2=[y1 + h],
                track_id=[g],
                annopoints=[dict(point=[
                    dict(id=[j], x=[pts[j, 0]], y=[pts[j, 1]])
                    for j in range(J) if joints[j]])]))
        prs, prs_s, prs_v = [], [], []
        pr_rects = []
        for p in range(P):
            joints = rng.rand(J) > 0.3
            if not joints.any():
                joints[rng.randint(J)] = True
            pts = np.zeros((J, 2))
            scs = rng.rand(J)
            for j in range(J):
                if G and rng.rand() < 0.7:
                    g = rng.randint(G)
                    hs = 0.6 * np.linalg.norm(
                        np.subtract(heads[g][2:4], heads[g][0:2]))
                    pts[j] = gts[g][j, :2] + rng.randn(2) * 0.4 * hs
                else:
                    pts[j] = rng.uniform(0, 200, 2)
            prs.append(pts)
            prs_s.append(scs)
            prs_v.append(joints)
            pr_rects.append(dict(
                track_id=[p],
                annopoints=[dict(point=[
                    dict(id=[j], x=[pts[j, 0]], y=[pts[j, 1]],
                         score=[scs[j]])
                    for j in range(J) if joints[j]])]))
        gt_frames.append(dict(annorect=gt_rects))
        pr_frames.append(dict(annorect=pr_rects))
        my_frames.append(dict(
            gt_points=np.stack(gts) if gts else np.zeros((0, J, 3)),
            gt_head_boxes=(np.asarray(heads) if heads
                           else np.zeros((0, 4))),
            pr_points=np.stack(prs) if prs else np.zeros((0, J, 2)),
            pr_scores=np.stack(prs_s) if prs_s else np.zeros((0, J)),
            pr_valid=np.stack(prs_v) if prs_v else np.zeros((0, J), bool),
        ))
    return gt_frames, pr_frames, my_frames


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_ap_matches_vendored_poseval(poseval, seed):
    rng = np.random.RandomState(seed)
    gt_frames, pr_frames, my_frames = _rand_frames(rng, n_frames=12)
    ap_ref, _, _ = poseval.evaluateAP(gt_frames, pr_frames)
    ap_ref = ap_ref[:, 0]

    res = evaluate_posetrack_ap(my_frames)
    ap_mine = res["per_joint"]
    for j in range(J):
        if np.isnan(ap_ref[j]):
            assert np.isnan(ap_mine[j]), (j, ap_ref[j], ap_mine[j])
        else:
            assert abs(ap_ref[j] - ap_mine[j]) < 1e-9, (
                j, ap_ref[j], ap_mine[j])
    assert abs(ap_ref[J] - res["Mean"]) < 1e-9


# ---------------------------------------------------------------------
# MOTA hand-computed cases
# ---------------------------------------------------------------------
def test_mot_accumulator_events():
    acc = MotAccumulator()
    # frame 1: both tracked correctly
    acc.update([0, 1], [10, 11], np.array([[0.1, np.nan],
                                           [np.nan, 0.2]]))
    assert (acc.num_detections, acc.num_switches, acc.num_misses,
            acc.num_false_positives) == (2, 0, 0, 0)
    # frame 2: object 0 now only reachable via a new hypothesis -> SWITCH
    acc.update([0, 1], [12, 11], np.array([[0.1, np.nan],
                                           [np.nan, 0.2]]))
    assert acc.num_switches == 1 and acc.num_detections == 4
    # frame 3: object 1 unmatched -> MISS; stray hypothesis -> FP
    acc.update([0, 1], [12, 99], np.array([[0.1, np.nan],
                                           [np.nan, np.nan]]))
    assert acc.num_misses == 1 and acc.num_false_positives == 1
    assert acc.num_objects == 6
    # carry-forward has priority over a cheaper new assignment
    acc2 = MotAccumulator()
    acc2.update([0], [5], np.array([[0.4]]))
    acc2.update([0], [5, 6], np.array([[0.4, 0.1]]))
    assert acc2.num_switches == 0 and acc2.num_detections == 2


def _perfect_frame(track_swap=False):
    gts = np.zeros((2, J, 3))
    gts[:, :, 2] = 1
    gts[0, :, 0] = 10
    gts[1, :, 0] = 100
    gts[:, :, 1] = np.arange(J) * 5
    heads = np.array([[0, 0, 20, 20], [90, 0, 110, 20]], float)
    return dict(
        gt_points=gts, gt_head_boxes=heads, gt_track_ids=[0, 1],
        pr_points=gts[:, :, :2].copy(),
        pr_scores=np.ones((2, J)), pr_valid=np.ones((2, J), bool),
        pr_track_ids=[10, 12] if track_swap else [10, 11])


def test_mota_perfect_with_one_switch():
    # 3 frames, last dropped (reference quirk); frame 2 swaps one track id
    frames = [_perfect_frame(), _perfect_frame(track_swap=True),
              _perfect_frame()]
    res = evaluate_posetrack_mota(frames, seq_ids=[0, 0, 0])
    # per joint: 4 objects over 2 scored frames, 1 switch
    assert abs(res["MOTA"] - 100.0 * (1 - 1 / 4)) < 1e-9
    assert abs(res["Recall"] - 100.0) < 1e-9
    assert abs(res["MOTP"] - 100.0) < 1e-9  # exact hits: sumD = 0


def test_mota_empty_frame_dummy_quirk():
    # a frame with no predictions contributes ONE dummy object + ONE dummy
    # FP per joint (reference assignGTmulti else-branch), not its real
    # GT count
    empty = dict(_perfect_frame())
    empty["pr_points"] = np.zeros((0, J, 2))
    empty["pr_scores"] = np.zeros((0, J))
    empty["pr_valid"] = np.zeros((0, J), bool)
    empty["pr_track_ids"] = []
    frames = [empty, _perfect_frame()]  # second frame dropped
    res = evaluate_posetrack_mota(frames, seq_ids=[0, 0])
    # per joint: 1 dummy object, 1 miss, 1 FP -> MOTA = 100*(1-2/1)
    assert abs(res["MOTA"] - (-100.0)) < 1e-9
