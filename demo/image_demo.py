#!/usr/bin/env python
"""Single image/clip demo with skeleton visualization
(reference surface: ``demo/image_demo.py``).

Usage:
    python demo/image_demo.py IMG [IMG_PREV IMG_NEXT] CONFIG CHECKPOINT
        [--out-file out.jpg] [--score-thr 0.3]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax
    jax.config.update("jax_platforms", "cpu")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("img", nargs="+",
                   help="image path (1 for PETR, T for video models)")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--out-file", default="demo_result.jpg")
    p.add_argument("--score-thr", type=float, default=0.3)
    return p.parse_args()


def draw(img, kpts, scores, score_thr):
    # shared renderer: 14 (CrowdPose) / 15 (PoseTrack) / 17 (COCO)
    # skeleton tables (reference ``videoposev1.py:354``)
    from pavenet_tpu.utils.visualize import draw_poses
    return draw_poses(img, kpts, scores, score_thr)


def main():
    args = parse_args()
    import cv2
    import numpy as np
    from pavenet_tpu.apis.inference import init_detector, inference_detector

    model, variables = init_detector(args.config, args.checkpoint)
    out = inference_detector(model, variables, args.img
                             if len(args.img) > 1 else args.img[0])
    keep = np.asarray(out["keep"])
    kpts = np.asarray(out["det_kpts"])[keep]
    scores = np.asarray(out["det_bboxes"])[keep][:, 4]
    img = cv2.imread(args.img[len(args.img) // 2])
    img = draw(img, kpts, scores, args.score_thr)
    cv2.imwrite(args.out_file, img)
    print(f"{(scores >= args.score_thr).sum()} poses -> {args.out_file}")


if __name__ == "__main__":
    main()
