"""Full-resolution train-step bench on the single TPU.

Flagship PAVE-Net (R50 T=3, 800x1344, bf16 activations) with the
production optimizer chain; times jitted steps with the one-dispatch
chain methodology (fetch the loss scalar to drain).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", default="800x1344")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--encoder-mode", default="deformable",
                    choices=["deformable", "windowed"])
    args = ap.parse_args()
    hh, ww = (int(x) for x in args.bucket.split("x"))

    from pavenet_tpu.models import zoo
    from pavenet_tpu.apis.train import create_train_state, make_train_step

    model = zoo.pavenet_r50_frames3(dtype=jnp.bfloat16,
                                    encoder_mode=args.encoder_mode)
    rng = np.random.RandomState(0)
    batch = {k: jnp.asarray(v) for k, v in zoo.dummy_clip_batch(
        rng, height=hh, width=ww, train=True).items()}

    t0 = time.perf_counter()
    state, tx = create_train_state(model, batch)
    step = make_train_step(model, tx)
    print(f"# init {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    first = {k: float(v) for k, v in metrics.items() if k == "loss"}
    t_compile = time.perf_counter() - t0
    print(f"# first step (compile) {t_compile:.1f}s loss {first}",
          flush=True)

    losses = []
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))  # drains each step
    per = (time.perf_counter() - t0) / args.steps
    print(f"train step: {per:.3f} s/step at {hh}x{ww} bf16 "
          f"(losses {', '.join(f'{x:.2f}' for x in losses)})")


if __name__ == "__main__":
    main()
