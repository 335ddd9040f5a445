"""Decompose the full-resolution train step: loss-forward vs grad vs
optimizer-update cost on the single TPU (one-dispatch chain timing)."""
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


def timeit(fn, *args, iters=3, tag=""):
    t0 = time.perf_counter()
    out = fn(*args)
    drained = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        drained = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    per = (time.perf_counter() - t0) / iters
    print(f"{tag:28s} {per*1e3:8.1f} ms  (compile {compile_s:.0f}s, "
          f"drain {drained:.4f})", flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", default="800x1344")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    hh, ww = (int(x) for x in args.bucket.split("x"))

    from pavenet_tpu.models import zoo
    from pavenet_tpu.apis.train import create_train_state, make_train_step

    model = zoo.pavenet_r50_frames3(dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    batch = {k: jnp.asarray(v) for k, v in zoo.dummy_clip_batch(
        rng, height=hh, width=ww, train=True).items()}

    state, tx = create_train_state(model, batch)
    dkey = jax.random.PRNGKey(1)

    def loss_fn(params):
        losses = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch, train=True, rngs={"dropout": dkey})
        return losses["loss"], losses

    fwd = jax.jit(lambda p: loss_fn(p)[0])
    timeit(fwd, state.params, iters=args.iters, tag="loss forward")

    grad = jax.jit(lambda p: jax.value_and_grad(
        lambda q: loss_fn(q)[0])(p)[1])
    timeit(grad, state.params, iters=args.iters, tag="loss + full grad")

    grads = grad(state.params)

    import optax
    def opt(gr, st):
        updates, opt_state = tx.update(gr, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        return params
    optf = jax.jit(opt)
    timeit(optf, grads, state, iters=args.iters, tag="optimizer update")

    step = make_train_step(model, tx, donate=False)
    def run(st, b):
        st2, losses = step(st, b)
        return losses["loss"]
    timeit(run, state, batch, iters=args.iters, tag="full train step")


if __name__ == "__main__":
    main()
