#!/usr/bin/env python
"""Generate pseudo boxes from keypoints for single-stage pose training
(reference surface: ``tools/dataset_converters/keypoint2pseudo_box.py``).

Replaces each annotation's bbox with the keypoint circumscribed rectangle
expanded by a margin.

Usage: python tools/dataset_converters/keypoint2pseudo_box.py IN.json OUT.json
"""
import argparse
import json

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--margin", type=float, default=0.1,
                   help="relative expansion of the keypoint bbox")
    args = p.parse_args()
    with open(args.input) as f:
        data = json.load(f)
    n = 0
    for ann in data.get("annotations", []):
        k = np.asarray(ann.get("keypoints", []), np.float32).reshape(-1, 3)
        vis = k[:, 2] > 0
        if not vis.any():
            continue
        x0, y0 = k[vis, 0].min(), k[vis, 1].min()
        x1, y1 = k[vis, 0].max(), k[vis, 1].max()
        w, h = x1 - x0, y1 - y0
        mx, my = w * args.margin, h * args.margin
        ann["bbox"] = [float(x0 - mx), float(y0 - my),
                       float(w + 2 * mx), float(h + 2 * my)]
        ann["area"] = float((w + 2 * mx) * (h + 2 * my))
        n += 1
    with open(args.output, "w") as f:
        json.dump(data, f)
    print(f"rewrote {n} boxes -> {args.output}")


if __name__ == "__main__":
    main()
