#!/usr/bin/env python
"""Time the eval loop's three moving parts (loader next / jit dispatch /
packed fetch) at an arbitrary bucket — the per-stage companion to
apis/test.py's aggregate steady-state number.

    python tools/perf/eval_loop_anatomy.py \
        configs/videopose/pavenet_r50_frames3_synthetic.py \
        work_dirs/randinit/step_0 --ann data/synth_full/val.json \
        --root data/synth_full --clips 12
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--ann", required=True)
    p.add_argument("--root", required=True)
    p.add_argument("--clips", type=int, default=12)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from pavenet_tpu import Config
    from pavenet_tpu.config import replace_cfg_vals
    from pavenet_tpu.models.builder import build_detector
    from pavenet_tpu.registry import DATASETS
    from pavenet_tpu.datasets.loader import ClipLoader
    from pavenet_tpu.datasets.pipelines import build_test_pipeline
    from pavenet_tpu.utils.checkpoint import restore_variables
    from pavenet_tpu.utils import enable_compilation_cache
    from pavenet_tpu.apis.test import _make_prep, IMG_NORM_MEAN, IMG_NORM_STD

    cfg = replace_cfg_vals(Config.fromfile(args.config))
    enable_compilation_cache(None, cfg)
    model = build_detector(cfg.model)
    pipe_kwargs = dict(cfg.get("test_pipeline_kwargs", {}))
    pipe_kwargs.setdefault("normalize_on_device", True)
    test_cfg = dict(cfg.data["test"])
    test_cfg.pop("pipeline", None)
    test_cfg.update(ann_file=args.ann, img_prefix=args.root)
    dataset = DATASETS.build(
        dict(**test_cfg, pipeline=build_test_pipeline(**pipe_kwargs)))
    loader = ClipLoader(dataset, batch_size=1, shuffle=False,
                        drop_last=False,
                        num_keypoints=dataset.NUM_KEYPOINTS)
    variables = jax.device_put(
        restore_variables(os.path.abspath(args.checkpoint)))

    prep = _make_prep((IMG_NORM_MEAN, IMG_NORM_STD))
    infer = jax.jit(lambda v, b: model.apply(v, prep(b), train=False))

    def _packed(v, b):
        out = infer(v, b)
        B = out["det_kpts"].shape[0]
        return jnp.concatenate(
            [out["det_kpts"].reshape(B, -1).astype(jnp.float32),
             out["det_bboxes"].reshape(B, -1).astype(jnp.float32),
             out["det_labels"].astype(jnp.float32),
             out["keep"].astype(jnp.float32)], axis=-1)

    packed = jax.jit(_packed)

    t_next, t_disp, t_fetch, t_block = [], [], [], []
    it = iter(loader)
    handle = None
    for i in range(args.clips + 1):
        t0 = time.perf_counter()
        try:
            batch = next(it)
        except StopIteration:
            break
        t1 = time.perf_counter()
        feed = {k: batch[k] for k in ("img", "img_shape", "scale_factor")}
        h = packed(variables, feed)
        t2 = time.perf_counter()
        if handle is not None:
            np.asarray(handle)
        t3 = time.perf_counter()
        handle = h
        if i > 0:   # skip the compile clip
            t_next.append(t1 - t0)
            t_disp.append(t2 - t1)
            t_fetch.append(t3 - t2)
        else:
            # force the first compile to finish before timing
            np.asarray(h)
            handle = None
            print(f"first clip (compile): {t2 - t1:.1f}s")
    if handle is not None:
        t0 = time.perf_counter()
        np.asarray(handle)
        t_block.append(time.perf_counter() - t0)
    for name, ts in (("loader next()", t_next), ("jit dispatch", t_disp),
                     ("fetch prev packed", t_fetch),
                     ("final blocking fetch", t_block)):
        if ts:
            print(f"{name:22s} mean {np.mean(ts)*1e3:8.1f} ms  "
                  f"p50 {np.percentile(ts, 50)*1e3:8.1f} ms  n={len(ts)}")
    tot = np.mean(t_next) + np.mean(t_disp) + np.mean(t_fetch)
    print(f"steady-state sum: {tot*1e3:.1f} ms/clip")


if __name__ == "__main__":
    main()
