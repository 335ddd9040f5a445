"""Round-4: decompose the ~126 ms/pose-decoder-layer train cost.

bwd_anatomy measured 126 ms/layer marginal fwd+grad; loss_anatomy put
only ~14.5 ms of it on the loss side.  This isolates the pose
cross-attention (the only per-layer op touching the (B,T,N,C) memory)
at production decoder shapes: B=1, T=3, N=22323 (800x1344 levels),
Q=300, H=8, L=4, K=15, bf16.

Cases:
  xattn_fwd     pose cross-attn forward alone
  xattn_grad    fwd+grad wrt (query, value, refs) — the in-model AD
  sgrad         _grad_value_rows alone (the custom-VJP value scatter)
  local         self-attn + FFN + norms at Q=300 fwd+grad
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

SHAPES = ((100, 168), (50, 84), (25, 42), (13, 21))
N = sum(h * w for h, w in SHAPES)
B, T, Q, H, L, K, C = 1, 3, 300, 8, 4, 15, 256


def timeit(fn, *args, iters=5, tag=""):
    t0 = time.perf_counter()
    out = fn(*args)
    drained = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        drained = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    per = (time.perf_counter() - t0) / iters
    print(f"{tag:24s} {per * 1e3:8.2f} ms  (compile {compile_s:.0f}s, "
          f"drain {drained:.4f})", flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cases", default="xattn_fwd,xattn_grad,sgrad,local")
    args = ap.parse_args()
    cases = set(args.cases.split(","))

    from pavenet_tpu.models.attention.deformable import (
        MultiFramePoseDeformableAttention)
    from pavenet_tpu.models.layers.transformer import (
        MultiheadAttention, FFN)
    import flax.linen as nn

    rng = np.random.RandomState(0)
    query = jnp.asarray(rng.randn(B, Q, C), jnp.bfloat16)
    qpos = jnp.asarray(rng.randn(B, Q, C), jnp.bfloat16)
    memory = jnp.asarray(rng.randn(B, T, N, C), jnp.bfloat16)
    refs = jnp.asarray(
        jax.nn.sigmoid(jnp.asarray(rng.randn(B, T, Q, L, 2 * K))),
        jnp.float32)
    mask = jnp.zeros((B, T, N), bool)

    attn = MultiFramePoseDeformableAttention(
        num_frames=T, embed_dims=C, num_heads=H, num_levels=L,
        num_points=K, dtype=jnp.bfloat16)
    params = attn.init(jax.random.PRNGKey(0), query, memory, refs,
                       SHAPES, mask, query_pos=qpos)

    def apply(p, q, m, r):
        return attn.apply(p, q, m, r, SHAPES, mask, query_pos=qpos)

    if "xattn_fwd" in cases:
        f = jax.jit(lambda p, q, m, r: apply(
            p, q, m, r).astype(jnp.float32).sum())
        timeit(f, params, query, memory, refs, iters=args.iters,
               tag="xattn fwd")
    if "xattn_grad" in cases:
        g = jax.jit(jax.grad(
            lambda q, m, r, p: apply(p, q, m, r).astype(
                jnp.float32).sum(), argnums=(0, 1, 2)))
        timeit(g, query, memory, refs, params, iters=args.iters,
               tag="xattn fwd+grad")

    if "sgrad" in cases:
        from pavenet_tpu.ops.ms_deform_attn import _grad_value_rows
        BT = B * T
        value = jnp.asarray(rng.randn(BT, N, H, C // H), jnp.bfloat16)
        locs = jnp.asarray(
            jax.nn.sigmoid(jnp.asarray(
                rng.randn(BT, Q, H, L, K, 2))), jnp.float32)
        wts = jnp.asarray(rng.rand(BT, Q, H, L, K), jnp.float32)
        gout = jnp.asarray(rng.randn(BT, Q, C), jnp.bfloat16)
        f = jax.jit(lambda v, l, w, g: _grad_value_rows(
            v, SHAPES, l, w, g).astype(jnp.float32).sum())
        timeit(f, value, locs, wts, gout, iters=args.iters,
               tag="sgrad scatter")
    if "local" in cases:
        class Local(nn.Module):
            @nn.compact
            def __call__(self, q):
                q = MultiheadAttention(embed_dims=C, num_heads=H,
                                       dtype=jnp.bfloat16)(
                    q, query_pos=qpos, deterministic=True)
                q = nn.LayerNorm(dtype=jnp.bfloat16)(q)
                q = FFN(embed_dims=C, feedforward_channels=1024,
                        dtype=jnp.bfloat16)(q, deterministic=True)
                return nn.LayerNorm(dtype=jnp.bfloat16)(q)
        mod = Local()
        p2 = mod.init(jax.random.PRNGKey(0), query)
        g = jax.jit(jax.grad(lambda q, p: mod.apply(p, q).astype(
            jnp.float32).sum()))
        timeit(g, query, p2, iters=args.iters, tag="self+ffn fwd+grad")


if __name__ == "__main__":
    main()
