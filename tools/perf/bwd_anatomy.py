"""Round-4 backward anatomy: attribute the non-msda training backward.

PERF_NOTES "packed-kernel follow-ups" left ~400+ ms of the 0.94 s step
unattributed (loss fwd 230 ms, fwd+grad 924 ms; the msda scatter
backward is minimal-structure).  This measures fwd+grad while ablating
one stage at a time (same methodology as the parity-clip anatomy):

  enc=6/3/1        -> per-encoder-layer fwd+bwd cost
  frozen backbone  -> backbone+neck AD cost (stop_gradient at the neck)
  dec=1, refine=1  -> decoder/joint-decoder AD cost

Reference counterpart being attributed: the production grad-accum-8
recipe (configs/videopose/2025-2-13/...posetrack17.py:150-153).
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


def measure(model, batch, iters, tag, prng_impl=None):
    from pavenet_tpu.apis.train import create_train_state

    state, _ = create_train_state(model, batch)
    # typed key: flax rejects non-threefry legacy keys (uint32[4])
    dkey = jax.random.key(1, impl=prng_impl)

    def loss_fn(params):
        losses = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch, train=True, rngs={"dropout": dkey})
        return losses["loss"]

    grad = jax.jit(lambda p: jax.value_and_grad(loss_fn)(p))
    t0 = time.perf_counter()
    v, g = grad(state.params)
    drained = float(v)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        v, g = grad(state.params)
        drained = float(v)
    per = (time.perf_counter() - t0) / iters
    print(f"{tag:36s} {per * 1e3:8.1f} ms fwd+grad  (compile "
          f"{compile_s:.0f}s, loss {drained:.4f})", flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", default="800x1344")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cases", default="base,enc3,enc1,frozen,dec1,ref1")
    args = ap.parse_args()
    hh, ww = (int(x) for x in args.bucket.split("x"))

    from pavenet_tpu.models import zoo

    rng = np.random.RandomState(0)
    batch = {k: jnp.asarray(v) for k, v in zoo.dummy_clip_batch(
        rng, height=hh, width=ww, train=True).items()}

    cases = {
        "base": {},
        "drop0": dict(dropout=0.0),   # dropout-RNG + mask cost
        # base arch, rbg dropout key: hardware RNG for mask bits
        # (threefry bit-gen is the drop0-vs-base 88 ms)
        "rbg": {},
        "enc3": dict(num_encoder_layers=3),
        "enc1": dict(num_encoder_layers=1),
        "frozen": dict(freeze_backbone_neck=True),
        "dec1": dict(num_decoder_layers=1),
        "ref1": dict(num_refine_layers=1),
    }
    for name in args.cases.split(","):
        model = zoo.pavenet_r50_frames3(dtype=jnp.bfloat16, **cases[name])
        measure(model, batch, args.iters, f"{name} {cases[name]}",
                prng_impl="rbg" if name == "rbg" else None)


if __name__ == "__main__":
    main()
