#!/usr/bin/env python
"""Attribute the eval-CLI host overhead per pipeline stage (VERDICT r4
weak 7: tools/test.py ran at ~3.4 s/clip incl. host vs 181 ms device —
~17x; this harness decomposes the host side so the fix targets the
actual cost).

Times, per clip over a PoseTrack-format dataset:
  - dataset index -> sample dict (ann assembly)
  - each test-pipeline stage (LoadClip / Resize / Normalize /
    PadToBucket / FormatBatch) separately
  - GT padding + collate (ClipLoader._sample + _collate)

Usage:
    JAX_PLATFORMS=cpu python tools/perf/host_anatomy.py \
        --ann data/synth_sm/val.json --root data/synth_sm [--clips 30]

Pure host; no device work.  Results land in PERF_NOTES "host anatomy".
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann", required=True)
    p.add_argument("--root", required=True)
    p.add_argument("--clips", type=int, default=30)
    p.add_argument("--img-scale", type=int, nargs=2, default=None,
                   help="(w, h) test scale; default = native size")
    p.add_argument("--loadclip-cache", type=int, default=0,
                   help="LoadClip decode-cache size (0 = off)")
    args = p.parse_args()

    from pavenet_tpu.registry import DATASETS
    from pavenet_tpu.datasets.loader import pad_gt
    from pavenet_tpu.datasets.pipelines.transforms import (
        LoadClip, Resize, Normalize, PadToBucket, FormatBatch, Compose)

    # identity pipeline: stages timed individually below
    ds = DATASETS.build(dict(
        type="opera.PosetrackVideoPoseDataset", ann_file=args.ann,
        img_prefix=args.root, test_mode=True, pipeline=Compose([])))
    n = min(args.clips, len(ds))

    import json
    with open(args.ann) as f:
        meta = json.load(f)
    W = meta["images"][0]["width"]
    H = meta["images"][0]["height"]
    scale = tuple(args.img_scale) if args.img_scale else (W, H)

    stages = [
        ("load", LoadClip(cache_size=args.loadclip_cache)
         if args.loadclip_cache else LoadClip()),
        ("resize", Resize([scale], multiscale_mode="value")),
        ("normalize", Normalize()),
        ("pad", PadToBucket()),
        ("format", FormatBatch()),
    ]
    times = {name: 0.0 for name, _ in stages}
    times["index"] = 0.0
    times["pad_gt+collate"] = 0.0

    for i in range(n):
        t0 = time.time()
        s = ds[i]
        times["index"] += time.time() - t0
        for name, stage in stages:
            t0 = time.time()
            s = stage(s)
            times[name] += time.time() - t0
        t0 = time.time()
        s = pad_gt(s, 30, ds.NUM_KEYPOINTS)
        batch = {k: np.stack([v], 0) for k, v in s.items()}
        times["pad_gt+collate"] += time.time() - t0

    total = sum(times.values())
    print(f"{n} clips at native {H}x{W}, test scale {scale}:")
    for name in ("index", "load", "resize", "normalize", "pad",
                 "format", "pad_gt+collate"):
        ms = times[name] / n * 1e3
        print(f"  {name:16s} {ms:8.1f} ms/clip  "
              f"({100 * times[name] / total:5.1f}%)")
    print(f"  {'TOTAL host':16s} {total / n * 1e3:8.1f} ms/clip")


if __name__ == "__main__":
    main()
