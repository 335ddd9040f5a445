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


# ---------------------------------------------------------------------
# Composed protocol differential: detection dicts -> our frames_from_coco
# -> AP vs the SAME source of truth written as annolist json files and
# pushed through the vendored poseval file pipeline (load_data_dir ->
# cleanupData -> removeIgnoredPoints -> evaluateAP).  Covers the protocol
# quirks the reference reaches via the patched COCOeval + file round trip
# (``posetrack_video_pose.py:443-512``): maxDets=30 truncation, empty-GT
# frame drop, ignore-region point removal.
# ---------------------------------------------------------------------
@pytest.fixture(scope="module")
def poseval_helpers(poseval):
    """eval_helpers with a *functional* shapely stub (matplotlib.path) so
    the ignore-region branch runs the vendored geometry for real."""
    from matplotlib.path import Path as MplPath

    class _Point:
        def __init__(self, x, y):
            self.x, self.y = float(x), float(y)

    class _Polygon:
        def __init__(self, coords):
            self._path = MplPath(np.asarray(coords, float))

        def contains(self, pt):
            return bool(self._path.contains_point((pt.x, pt.y)))

    geom = sys.modules["shapely.geometry"]
    geom.Point = _Point
    geom.Polygon = _Polygon
    helpers = sys.modules["poseval_ref.eval_helpers"]
    helpers.geometry = geom
    return helpers


def _synthetic_posetrack(rng, n_videos=3, n_frames=5):
    """One synthetic PoseTrack val set in both representations.

    Returns (coco_gt_dict, detections, annolist_gts, annolist_preds) where
    the annolists are per-video {"annolist": [...]} dicts keyed by video
    name.  Includes: an unlabeled frame, a labeled frame with zero GT, a
    frame with >30 detections, and ignore regions swallowing some points.
    """
    images, annotations, detections = [], [], []
    gt_files, pr_files = {}, {}
    img_id, ann_id = 0, 0
    for v in range(n_videos):
        vname = f"{10000 + v}_mpii"
        gt_frames, pr_frames = [], []
        for f in range(1, n_frames + 1):
            img_id += 1
            name = f"images/val/{vname}/{str(f).zfill(8)}.jpg"
            is_labeled = not (v == 0 and f == 2)   # one unlabeled frame
            info = dict(id=img_id, file_name=name, is_labeled=is_labeled,
                        vid_id=vname, nframes=n_frames,
                        width=400, height=300)
            # ignore regions on some frames of video 1
            ign = []
            if v == 1 and f in (1, 3):
                cx, cy = rng.uniform(50, 350), rng.uniform(50, 250)
                r = rng.uniform(30, 80)
                ang = np.linspace(0, 2 * np.pi, 7)[:-1]
                ign = [(list(cx + r * np.cos(ang)),
                        list(cy + r * np.sin(ang)))]
                info["ignore_regions_x"] = [p[0] for p in ign]
                info["ignore_regions_y"] = [p[1] for p in ign]
            images.append(info)

            gt_rects, pr_rects = [], []
            # zero-GT labeled frame: video 2 frame 1
            G = 0 if (v == 2 and f == 1) else rng.randint(1, 4)
            gts, heads = [], []
            if is_labeled:
                for g in range(G):
                    joints = rng.rand(J) > 0.25
                    if not joints.any():
                        joints[rng.randint(J)] = True
                    pts = np.zeros((J, 3))
                    pts[:, 0] = rng.uniform(0, 400, J)
                    pts[:, 1] = rng.uniform(0, 300, J)
                    pts[:, 2] = joints * 2.0
                    hx, hy = rng.uniform(0, 350), rng.uniform(0, 250)
                    hw, hh = rng.uniform(15, 50, 2)
                    ann_id += 1
                    annotations.append(dict(
                        id=ann_id, image_id=img_id, category_id=1,
                        keypoints=pts.reshape(-1).tolist(),
                        bbox_head=[hx, hy, hw, hh], track_id=g,
                        num_keypoints=int(joints.sum()),
                        area=float(hw * hh), iscrowd=0,
                        bbox=[hx, hy, hw, hh]))
                    gt_rects.append(dict(
                        x1=[hx], y1=[hy], x2=[hx + hw], y2=[hy + hh],
                        track_id=[g], score=[1.0],
                        annopoints=[dict(point=[
                            dict(id=[j], x=[pts[j, 0]], y=[pts[j, 1]])
                            for j in range(J) if joints[j]])]))
                    gts.append(pts)
                    heads.append([hx, hy, hx + hw, hy + hh])
                # detections (many on video 2 frame 2 to hit maxDets=30)
                P = 35 if (v == 2 and f == 2) else rng.randint(0, 6)
                dets = []
                for p in range(P):
                    pts = np.zeros((J, 2))
                    scs = rng.uniform(0.01, 0.99, J)
                    for j in range(J):
                        if gts and rng.rand() < 0.7:
                            g = rng.randint(len(gts))
                            hs = 0.6 * np.linalg.norm(
                                np.subtract(heads[g][2:4], heads[g][0:2]))
                            pts[j] = gts[g][j, :2] + rng.randn(2) * 0.4 * hs
                        else:
                            pts[j] = [rng.uniform(0, 400),
                                      rng.uniform(0, 300)]
                    score = float(rng.uniform(0.01, 0.99))
                    kx = np.concatenate(
                        [pts, scs[:, None]], 1).reshape(-1)
                    detections.append(dict(
                        image_id=img_id, category_id=1,
                        keypoints=kx.tolist(), score=score))
                    dets.append((score, pts, scs, p))
                # annolist preds: COCOeval maxDets=[30] truncation by
                # detection score before the annolist is written
                dets.sort(key=lambda t: -t[0])
                for score, pts, scs, p in dets[:30]:
                    pr_rects.append(dict(
                        track_id=[p], score=[score],
                        annopoints=[dict(point=[
                            dict(id=[j], x=[pts[j, 0]], y=[pts[j, 1]],
                                 score=[scs[j]])
                            for j in range(J)])]))
            frame = dict(image=dict(name=name), imgnum=[f],
                         annorect=gt_rects)
            if ign:
                frame["ignore_regions"] = [
                    dict(point=[dict(x=[x], y=[y])
                                for x, y in zip(*poly)])
                    for poly in ign]
            gt_frames.append(frame)
            pr_frames.append(dict(image=dict(name=name), imgnum=[f],
                                  annorect=pr_rects))
        gt_files[vname] = dict(annolist=gt_frames)
        pr_files[vname] = dict(annolist=pr_frames)
    coco_gt = dict(images=images, annotations=annotations,
                   categories=[dict(id=1, name="person",
                                    keypoints=list(range(J)))])
    return coco_gt, detections, gt_files, pr_files


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_composed_eval_protocol_matches_vendored_pipeline(
        poseval, poseval_helpers, tmp_path, seed):
    import json
    from pavenet_tpu.datasets.coco_api import COCO
    from pavenet_tpu.core.eval.posetrack_eval import frames_from_coco

    rng = np.random.RandomState(40 + seed)
    coco_gt, detections, gt_files, pr_files = _synthetic_posetrack(rng)

    gt_dir = tmp_path / "gt"
    pr_dir = tmp_path / "pred"
    gt_dir.mkdir()
    pr_dir.mkdir()
    for vname in gt_files:
        (gt_dir / f"{vname}.json").write_text(json.dumps(gt_files[vname]))
        (pr_dir / f"{vname}.json").write_text(json.dumps(pr_files[vname]))

    gt_all, pr_all = poseval_helpers.load_data_dir(
        ["", str(gt_dir), str(pr_dir)])
    ap_ref, _, _ = poseval.evaluateAP(gt_all, pr_all)
    ap_ref = ap_ref[:, 0]

    frames = frames_from_coco(COCO(dataset=coco_gt), detections,
                              max_dets=30)
    res = evaluate_posetrack_ap(frames)
    ap_mine = res["per_joint"]
    for j in range(J):
        if np.isnan(ap_ref[j]):
            assert np.isnan(ap_mine[j]), (j, ap_ref[j], ap_mine[j])
        else:
            assert abs(ap_ref[j] - ap_mine[j]) < 1e-9, (
                j, ap_ref[j], ap_mine[j])
    assert abs(ap_ref[J] - res["Mean"]) < 1e-9
