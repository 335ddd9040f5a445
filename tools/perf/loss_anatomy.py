"""Round-4 loss/decoder anatomy: attribute the per-decoder-layer train
cost (bwd_anatomy measured 126 ms/pose-decoder layer, 71 ms/encoder
layer marginal at 800x1344 bf16).

Candidate costs per decoder layer: (a) the pose attention fwd+AD (P=K
XLA gather path — rematted before round 4), (b) the per-layer Hungarian
assignment (JV solver: ~30 sequential Dijkstra rows, latency-bound on
TPU), (c) the RLE flow + loss math.  Measures:

  outs3/outs1     forward_outputs only (no loss), dec=3 vs dec=1
  loss3/loss1     full loss forward, dec=3 vs dec=1
  sumgrad3/1      grad of sum(all outputs) — decoder AD without losses
  assign_dec      one decoder-shape assignment (Q=300) alone
  assign_enc      the encoder-shape assignment (Q~22k) alone

Reference counterpart: the production grad-accum-8 recipe
(configs/videopose/2025-2-13/...posetrack17.py:150-153).
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


def timeit(fn, *args, iters=3, tag=""):
    t0 = time.perf_counter()
    out = fn(*args)
    drained = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        drained = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    per = (time.perf_counter() - t0) / iters
    print(f"{tag:24s} {per * 1e3:8.1f} ms  (compile {compile_s:.0f}s, "
          f"drain {drained:.4f})", flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", default="800x1344")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cases",
                    default="outs3,outs1,loss3,loss1,assign")
    args = ap.parse_args()
    hh, ww = (int(x) for x in args.bucket.split("x"))

    from pavenet_tpu.models import zoo
    from pavenet_tpu.apis.train import create_train_state

    rng = np.random.RandomState(0)
    batch = {k: jnp.asarray(v) for k, v in zoo.dummy_clip_batch(
        rng, height=hh, width=ww, train=True).items()}
    cases = set(args.cases.split(","))

    models = {}

    def get(nd):
        if nd not in models:
            model = zoo.pavenet_r50_frames3(dtype=jnp.bfloat16,
                                            num_decoder_layers=nd)
            state, _ = create_train_state(model, batch)
            models[nd] = (model, state)
        return models[nd]

    dkey = jax.random.PRNGKey(1)

    for nd in (3, 1):
        tag = f"{nd}dec"
        model, state = get(nd)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if f"outs{nd}" in cases:
            # scalar reduce on-device: draining a (B,T,N,C) memory
            # tensor over the axon tunnel costs ~1.5s and swamps compute
            f = jax.jit(lambda v, m=model: sum(
                x.astype(jnp.float32).sum() for k, x in m.apply(
                    v, batch["img"], batch["img_shape"],
                    method=m.forward_outputs,
                    deterministic=True).items()
                if k in ("memory", "all_kpt_preds", "all_cls_scores")))
            timeit(f, variables, iters=args.iters, tag=f"outs fwd {tag}")
        if f"loss{nd}" in cases:
            f = jax.jit(lambda v, m=model: m.apply(
                v, batch, train=True, rngs={"dropout": dkey})["loss"])
            timeit(f, variables, iters=args.iters, tag=f"loss fwd {tag}")
        if f"sumgrad{nd}" in cases:
            def outsum(params, m=model, bs=state.batch_stats):
                outs = m.apply({"params": params, "batch_stats": bs},
                               batch["img"], batch["img_shape"],
                               method=m.forward_outputs,
                               deterministic=True)
                return (outs["all_kpt_preds"].astype(jnp.float32).sum()
                        + outs["all_cls_scores"].astype(
                            jnp.float32).sum())
            f = jax.jit(lambda p, m=model: jax.grad(outsum)(p))
            timeit(f, state.params, iters=args.iters,
                   tag=f"sum-grad {tag}")

    if "assign" in cases:
        model, state = get(3)
        B, Q, K = 1, 300, 15
        cls_s = jnp.asarray(rng.randn(B, Q, 1), jnp.float32)
        kpt_p = jax.nn.sigmoid(
            jnp.asarray(rng.randn(B, Q, 2 * K), jnp.float32))
        fa = jax.jit(lambda c, k: jax.tree.leaves(
            model.apply({"params": state.params,
                         "batch_stats": state.batch_stats},
                        c, k, batch, method=model._assign_batch))[0])
        timeit(fa, cls_s, kpt_p, iters=args.iters, tag="assign dec Q=300")
        # 3 layers stacked into one vmapped call (lockstep Dijkstra)
        cls3 = jnp.stack([cls_s] * 3)
        kpt3 = jnp.stack([kpt_p] * 3)
        fa3 = jax.jit(lambda c, k: jax.tree.leaves(jax.vmap(
            lambda cc, kk: model.apply(
                {"params": state.params,
                 "batch_stats": state.batch_stats},
                cc, kk, batch, method=model._assign_batch))(c, k))[0])
        timeit(fa3, cls3, kpt3, iters=args.iters,
               tag="assign dec 3x vmapped")
        N = 22323
        cls_e = jnp.asarray(rng.randn(B, N, 1), jnp.float32)
        kpt_e = jax.nn.sigmoid(
            jnp.asarray(rng.randn(B, N, 2 * K), jnp.float32))
        timeit(fa, cls_e, kpt_e, iters=args.iters,
               tag="assign enc Q=22323")


if __name__ == "__main__":
    main()
