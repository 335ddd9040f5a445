#!/usr/bin/env python
"""Teacher-student detection AGREEMENT on a shared eval set.

Scores one model's detections against another model's detections
treated as pseudo ground truth, using the same composed evaluators as
``tools/test.py`` (COCO OKS AP + PoseTrack per-joint AP).  This is the
round-4 windowed-encoder accuracy bound (VERDICT item 1): the
distilled windowed student differs from the parity teacher ONLY in the
encoder, so agreement AP measures exactly the encoder swap's effect on
the composed detection function — independent of the teacher's own
absolute AP on the synthetic ground truth.

Usage:
    python tools/perf/agreement_eval.py <val.json> <teacher_dets.json>
        <student_dets.json> [--gt-score-thr 0.3] [--kpt-vis-thr 0.2]

Detections are the ``--out`` payload of tools/test.py (image_id /
keypoints J*3 with per-joint score in the v slot / score).  Runs purely
on the host — no JAX, no device.

Interpretation note: pseudo-GT areas are the visible-keypoint bounding
extent, systematically SMALLER than the bbox/segmentation areas the
standard OKS protocol uses, so the absolute "agreement AP" here is
stricter than and not comparable to standard COCO AP.  Read the student
number only RELATIVE to the printed teacher self-consistency baseline
(which must be ~100 by construction — if it is not, the harness itself
is broken and the run is invalid).
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def dets_to_pseudo_gt(val_ann: dict, dets, gt_score_thr: float,
                      kpt_vis_thr: float, max_gt: int = 20) -> dict:
    """Teacher detections -> COCO-style annotations on val's images.

    Per image: keep detections with score >= gt_score_thr (always at
    least the top-1, so no labeled frame silently leaves the protocol),
    capped at max_gt.  Keypoint visibility v=2 where the per-joint score
    clears kpt_vis_thr; bbox/area from the visible-keypoint extent.
    """
    by_img = {}
    for det in dets:
        by_img.setdefault(int(det["image_id"]), []).append(det)
    anns, next_id = [], 1
    cat_id = (val_ann.get("categories") or [{"id": 1}])[0]["id"]
    for img in val_ann.get("images", []):
        cands = sorted(by_img.get(img["id"], []),
                       key=lambda d: -d.get("score", 0.0))
        kept = [d for d in cands if d.get("score", 0.0) >= gt_score_thr]
        if not kept and cands:
            kept = cands[:1]
        for rank, det in enumerate(kept[:max_gt]):
            k = np.asarray(det["keypoints"], np.float64).reshape(-1, 3)
            vis = k[:, 2] >= kpt_vis_thr
            if not vis.any():
                continue
            k = k.copy()
            k[:, 2] = np.where(vis, 2.0, 0.0)
            xs, ys = k[vis, 0], k[vis, 1]
            x0, y0 = float(xs.min()), float(ys.min())
            w = max(float(xs.max()) - x0, 1.0)
            h = max(float(ys.max()) - y0, 1.0)
            anns.append(dict(
                id=next_id, image_id=img["id"], category_id=cat_id,
                keypoints=k.reshape(-1).tolist(),
                num_keypoints=int(vis.sum()), bbox=[x0, y0, w, h],
                area=w * h, iscrowd=0, track_id=rank))
            next_id += 1
    pseudo = {k: v for k, v in val_ann.items() if k != "annotations"}
    pseudo["annotations"] = anns
    return pseudo


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("val_json")
    p.add_argument("teacher_dets")
    p.add_argument("student_dets")
    p.add_argument("--gt-score-thr", type=float, default=0.3)
    p.add_argument("--kpt-vis-thr", type=float, default=0.2)
    p.add_argument("--max-gt", type=int, default=20)
    p.add_argument("--out", default=None,
                   help="write the metric dict as JSON here too")
    args = p.parse_args()

    from pavenet_tpu.core.eval.coco_keypoint_eval import COCOKeypointEval
    from pavenet_tpu.core.eval.posetrack_eval import (
        evaluate_posetrack_ap, frames_from_coco)
    from pavenet_tpu.datasets.coco_api import COCO
    from pavenet_tpu.models.losses.oks_loss import OKS_SIGMAS

    with open(args.val_json) as f:
        val_ann = json.load(f)
    with open(args.teacher_dets) as f:
        teacher = json.load(f)
    with open(args.student_dets) as f:
        student = json.load(f)

    pseudo = dets_to_pseudo_gt(val_ann, teacher, args.gt_score_thr,
                               args.kpt_vis_thr, args.max_gt)
    n_img = len({a["image_id"] for a in pseudo["annotations"]})
    print(f"pseudo-GT: {len(pseudo['annotations'])} teacher poses on "
          f"{n_img} images (score>={args.gt_score_thr})")
    if not pseudo["annotations"]:
        raise SystemExit(
            "no pseudo-GT annotations: the teacher detection file is "
            f"empty or its image_ids do not overlap {args.val_json} "
            "(check the teacher eval stage's output)")
    gt = COCO(dataset=pseudo)
    num_k = len(np.asarray(
        pseudo["annotations"][0]["keypoints"]).reshape(-1, 3))
    sigmas = OKS_SIGMAS.get(num_k)

    out = {}
    for name, dets in (("self", teacher), ("student", student)):
        res = COCOKeypointEval(gt, gt.load_res(dets), sigmas=sigmas,
                               max_dets=30).evaluate()
        for k, v in res.items():
            out[f"{name}/coco_{k}"] = v
        pt = evaluate_posetrack_ap(frames_from_coco(gt, dets))
        for k, v in pt.items():
            if k != "per_joint":
                out[f"{name}/posetrack_{k}"] = v
    for k, v in out.items():
        print(f"{k}: {v:.4f}")
    t, s = out.get("self/posetrack_Mean"), out.get("student/posetrack_Mean")
    if t is not None and s is not None:
        print(f"agreement Mean-AP delta (teacher-self-consistency {t:.4f} "
              f"- student {s:.4f}) = {t - s:.4f}")
    # sanity gate: scoring the teacher against its own detections must be
    # ~perfect by construction; anything else means the harness is broken
    if t is not None and t < 95.0:
        print(f"WARNING: teacher self-consistency {t:.2f} < 95 — the "
              "agreement harness disagrees with its own pseudo-GT; "
              "treat this run as INVALID")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
