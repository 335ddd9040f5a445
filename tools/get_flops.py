#!/usr/bin/env python
"""Model complexity report: parameter counts + compiled FLOPs/memory.

Reference surface: ``tools/train_fixed.py`` (the reference's ad-hoc
model-complexity variant of train.py that runs torchinfo/thop on the built
model).  Here the numbers come from XLA itself: params are counted from the
initialized variable tree, FLOPs/bytes from ``Compiled.cost_analysis()`` of
the jitted inference forward at the requested input shape — i.e. the cost
of the program that actually runs, post-fusion, not an op-walk estimate.

Usage:
    python tools/get_flops.py <config.py> [--shape H W] [--cfg-options ...]
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
    p = argparse.ArgumentParser(description="Model params/FLOPs report")
    p.add_argument("config")
    p.add_argument("--shape", type=int, nargs=2, default=[800, 1344],
                   metavar=("H", "W"), help="input bucket (default "
                   "800 1344, the production eval bucket)")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--cfg-options", nargs="+", default=[])
    return p.parse_args()


def count_params(tree) -> int:
    import jax
    return sum(x.size for x in jax.tree.leaves(tree))


def human(n: float, unit: str = "") -> str:
    for div, suf in ((1e12, "T"), (1e9, "G"), (1e6, "M"), (1e3, "K")):
        if abs(n) >= div:
            return f"{n / div:.3f} {suf}{unit}"
    return f"{n:.0f} {unit}"


def main():
    args = parse_args()
    import jax
    import numpy as np
    from pavenet_tpu import Config, DictAction
    from pavenet_tpu.config import replace_cfg_vals
    from pavenet_tpu.models.builder import build_detector
    from pavenet_tpu.models.zoo import dummy_clip_batch

    cfg = Config.fromfile(args.config)
    cfg = replace_cfg_vals(cfg)
    if args.cfg_options:
        cfg.merge_from_dict(DictAction.parse(args.cfg_options))

    model = build_detector(cfg.model)
    H, W = args.shape
    rng = np.random.RandomState(0)
    if hasattr(model, "num_frames"):  # pose detectors (clip layout)
        batch = dummy_clip_batch(
            rng, batch_size=args.batch_size, num_frames=model.num_frames,
            height=H, width=W, num_keypoints=model.num_keypoints)
    else:  # detection / instance-seg detectors (single image layout)
        batch = dict(
            img=rng.randn(args.batch_size, H, W, 3).astype(np.float32),
            img_shape=np.tile(np.array([[H, W - 11]], np.int32),
                              (args.batch_size, 1)),
            scale_factor=np.full((args.batch_size, 2), 1.0, np.float32))
        if getattr(model, "cls_emb_dim", 0):  # DK-DETR wants text features
            batch["text_feats"] = rng.randn(
                model.num_classes, model.cls_emb_dim).astype(np.float32)

    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           batch, train=False))()

    params = variables["params"]
    total = count_params(params) + count_params(
        variables.get("batch_stats", {}))
    print(f"config: {args.config}")
    print(f"input:  {tuple(batch['img'].shape)}")
    print(f"params: {total:,} ({human(total)})")
    for name in sorted(params):
        n = count_params(params[name])
        print(f"  {name:<28s} {n:>12,} ({100.0 * n / total:5.1f}%)")

    lowered = jax.jit(
        lambda v, b: model.apply(v, b, train=False)).lower(variables, batch)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_ = float(cost.get("bytes accessed", 0.0))
    print(f"forward FLOPs (XLA, post-fusion): {human(flops, 'FLOP')}")
    if bytes_:
        print(f"bytes accessed:                   {human(bytes_, 'B')}")


if __name__ == "__main__":
    main()
