#!/usr/bin/env python
"""Pre-bake augmented training batches to disk (.npz per batch).

Usage:
    python tools/bake_batches.py <config.py> --out DIR --epochs N \
        [--seed S] [--cfg-options k=v ...]

Runs the config's REAL dataset + train pipeline + ClipLoader stack —
exactly as tools/train.py would — for N epoch passes, serializing every
collated batch as ``{out}/ep{k:03d}_{i:05d}.npz``.  Training then reads
them back via ``--prebaked DIR`` (``datasets/loader.PrebakedLoader``),
reducing per-step host cost to one uncompressed file read.

Built for the 1-vCPU synthetic-teacher recipe where python-side
augmentation (affine/photometric/resize at full image size) is ~3x the
device step time and throttles the chip; no reference counterpart (the
reference assumes many CPU dataloader workers per GPU).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Pre-bake train batches")
    p.add_argument("config")
    p.add_argument("--out", required=True)
    p.add_argument("--epochs", type=int, default=3,
                   help="number of augmentation variants to bake")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=None,
                   help="override data.samples_per_gpu")
    p.add_argument("--cfg-options", nargs="+", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    # baking is pure host work — never grab the TPU
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from pavenet_tpu import Config, DictAction
    from pavenet_tpu.config import replace_cfg_vals, update_data_root
    from pavenet_tpu.utils import set_random_seed
    from pavenet_tpu.registry import DATASETS
    from pavenet_tpu.datasets.loader import ClipLoader
    from pavenet_tpu.datasets.pipelines import build_train_pipeline

    cfg = Config.fromfile(args.config)
    cfg = replace_cfg_vals(cfg)
    update_data_root(cfg)
    if args.cfg_options:
        cfg.merge_from_dict(DictAction.parse(args.cfg_options))
    set_random_seed(args.seed)

    data_cfg = cfg.get("data", {})
    batch_size = args.batch_size or data_cfg.get("samples_per_gpu", 1)
    train_cfg = dict(data_cfg["train"])
    train_cfg.pop("pipeline", None)
    pipe_kwargs = dict(cfg.get("train_pipeline_kwargs", {}))
    dataset = DATASETS.build(
        dict(**train_cfg, pipeline=build_train_pipeline(**pipe_kwargs)))
    loader = ClipLoader(dataset, batch_size=batch_size,
                        max_gt=cfg.get("max_gt", 30),
                        num_keypoints=dataset.NUM_KEYPOINTS,
                        seed=args.seed, prefetch=0)

    os.makedirs(args.out, exist_ok=True)
    total_bytes = 0
    for e in range(args.epochs):
        t0 = time.time()
        n = 0
        for i, batch in enumerate(loader):
            path = os.path.join(args.out, f"ep{e:03d}_{i:05d}.npz")
            tmp = path + ".tmp.npz"
            np.savez(tmp, **batch)
            os.replace(tmp, path)
            total_bytes += os.path.getsize(path)
            n = i + 1
        print(f"epoch variant {e}: {n} batches in {time.time() - t0:.1f}s "
              f"({total_bytes / 1e9:.2f} GB cumulative)", flush=True)
    print(f"done: {args.epochs} variants under {args.out}")


if __name__ == "__main__":
    main()
