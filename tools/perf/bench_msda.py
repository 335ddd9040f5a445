"""Encoder-scale micro-bench for the ms-deform-attn sampling op.

Times one encoder-layer-equivalent call (all levels, Q = N tokens) with the
in-jit ``lax.scan`` methodology from PERF_NOTES.md: a naive timing loop over
the axon tunnel measures dispatch latency (~25-30ms RTT), so we chain
``iters`` calls inside ONE jit — each iteration feeds a scalar of its output
back into the next iteration's locations so XLA cannot CSE or reorder them —
and fetch one scalar at the end.

Usage:
  python tools/perf/bench_msda.py [--impl pallas|xla] [--iters 10] [--grad]
  python tools/perf/bench_msda.py --bucket 800x1344 --batch 3
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

# NOTE: do NOT use PYTHONPATH for this — an env PYTHONPATH breaks the axon
# PJRT plugin's entry-point discovery on this image; a runtime sys.path
# insert does not.
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: kernel iteration re-runs the same XLA programs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def encoder_shapes(hh: int, ww: int, L: int = 4, stride0: int = 8):
    shapes = []
    for lvl in range(L):
        s = stride0 << lvl
        shapes.append((-(-hh // s), -(-ww // s)))
    return tuple(shapes)


def make_inputs(shapes, B=3, H=8, D=32, P=4, seed=0, spread=4.0):
    """Grid reference points + gaussian pixel offsets (realistic locality)."""
    rng = np.random.RandomState(seed)
    N = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = rng.randn(B, N, H, D).astype(np.float32)
    # each query is a token of the multi-level grid; its reference point is
    # its own normalized position (two-stage encoder convention)
    refs = []
    for (h, w) in shapes:
        ys, xs = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                             indexing="ij")
        refs.append(np.stack([xs / w, ys / h], -1).reshape(-1, 2))
    ref = np.concatenate(refs, 0)  # (N, 2) normalized
    loc = np.zeros((B, N, H, L, P, 2), np.float32)
    for lvl, (h, w) in enumerate(shapes):
        off = rng.randn(B, N, H, P, 2) * spread
        loc[:, :, :, lvl, :, 0] = ref[None, :, None, None, 0] + off[..., 0] / w
        loc[:, :, :, lvl, :, 1] = ref[None, :, None, None, 1] + off[..., 1] / h
    attn = rng.rand(B, N, H, L, P).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)
    return (jnp.asarray(value), jnp.asarray(loc.astype(np.float32)),
            jnp.asarray(attn))


def bench(fn, value, loc, attn, iters, grad=False):
    """One-dispatch chained timing; returns seconds per call."""
    if grad:
        def one(v, l, a):
            def loss(v, l, a):
                return jnp.sum(fn(v, l, a) ** 2)
            gv, gl, ga = jax.grad(loss, argnums=(0, 1, 2))(v, l, a)
            return jnp.sum(gv) + jnp.sum(gl) + jnp.sum(ga)
    else:
        def one(v, l, a):
            return jnp.sum(fn(v, l, a))

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(v, l, a, n):
        def body(carry, _):
            s = one(v, l + carry * 1e-20, a)
            return s * 1e-20, s
        c, ss = jax.lax.scan(body, 0.0, None, length=n)
        return ss[-1]

    r1 = chain(value, loc, attn, 1)
    _ = float(r1)  # drain compile+exec (block_until_ready is a no-op on axon)
    t0 = time.perf_counter()
    r1 = chain(value, loc, attn, 1)
    _ = float(r1)
    t_one = time.perf_counter() - t0

    rn = chain(value, loc, attn, iters)
    _ = float(rn)  # warm compile for length=iters
    t0 = time.perf_counter()
    rn = chain(value, loc, attn, iters)
    val = float(rn)
    t_n = time.perf_counter() - t0
    per = (t_n - t_one) / (iters - 1)
    return per, val


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="pallas")
    ap.add_argument("--iters", type=int, default=11)
    ap.add_argument("--bucket", default="800x1344")
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--grad", action="store_true")
    ap.add_argument("--spread", type=float, default=4.0)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--check", action="store_true",
                    help="diff vs the XLA oracle first")
    args = ap.parse_args()

    hh, ww = (int(x) for x in args.bucket.split("x"))
    shapes = encoder_shapes(hh, ww)
    value, loc, attn = make_inputs(shapes, B=args.batch, spread=args.spread)
    value = value.astype(args.dtype)
    N = value.shape[1]
    print(f"# shapes={shapes} N={N} B={args.batch} impl={args.impl} "
          f"dtype={args.dtype} grad={args.grad} backend="
          f"{jax.default_backend()}")

    from pavenet_tpu.ops.ms_deform_attn import ms_deform_attn

    fn = functools.partial(ms_deform_attn, spatial_shapes=shapes)
    call = lambda v, l, a: fn(v, sampling_locations=l, attention_weights=a,
                              impl=args.impl)
    if args.check:
        ref = lambda v, l, a: fn(v, sampling_locations=l,
                                 attention_weights=a, impl="xla")
        o1 = call(value, loc, attn)
        o2 = ref(value, loc, attn)
        err = float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                    - o2.astype(jnp.float32))))
        print(f"# max |pallas - xla| = {err:.3e}")

    t0 = time.perf_counter()
    per, val = bench(call, value, loc, attn, args.iters, grad=args.grad)
    wall = time.perf_counter() - t0
    print(f"per-call {per * 1e3:.2f} ms  (chk {val:.6g}, total wall "
          f"{wall:.1f}s incl compile)")


if __name__ == "__main__":
    main()
