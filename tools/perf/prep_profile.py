"""Decompose the msda XLA-side prep cost (tap build / value tables /
windows / epilogue) — measured 43.6 of the 53 ms encoder-scale floor
(`msda_ablate.py --abl preponly`), i.e. the Pallas kernel's main loop is
~9 ms and the prep chain now dominates.

Times each piece with the one-dispatch chain methodology.

Run: python tools/perf/prep_profile.py [--iters 11]
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
    from bench_msda import encoder_shapes, make_inputs
    from pavenet_tpu.ops.pallas import msda as M

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=11)
    ap.add_argument("--bucket", default="800x1344")
    ap.add_argument("--batch", type=int, default=3)
    args = ap.parse_args()
    hh, ww = (int(x) for x in args.bucket.split("x"))
    shapes = encoder_shapes(hh, ww)
    value, loc, attn = make_inputs(shapes, B=args.batch)
    value = jnp.asarray(value)
    loc = jnp.asarray(loc)
    attn = jnp.asarray(attn)
    B, N, H, D = value.shape
    tile_base, T_total = M._tile_bases(shapes)
    locs_p, attn_p, Qpad = M._pad_queries(loc, attn)
    NC = Qpad * M.GROUP // M.LANE
    CB = M.CB

    def chain(fn, *xs):
        """Chain iters dependent calls of fn; returns (per_call_s, chk)."""
        def loop(*xs):
            def body(c, _):
                outs = fn(*jax.tree.map(
                    lambda x: (x + c * 0.0).astype(x.dtype)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x, xs))
                leaf = jax.tree.leaves(outs)[0]
                return leaf.reshape(-1)[0].astype(jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None,
                                length=args.iters)
            return c
        f = jax.jit(loop)
        chk = float(np.asarray(f(*xs)))  # compile + run
        t0 = time.perf_counter()
        chk = float(np.asarray(f(*xs)))
        return (time.perf_counter() - t0) / args.iters, chk

    pieces = {}

    pieces["value_tables"] = chain(
        lambda v: M._value_tables(v, shapes, T_total), value)

    def taps(lo, at):
        idx, w = M._prep_taps(shapes, lo, at, tile_base)
        return idx.astype(jnp.float32) + w  # force both
    pieces["prep_taps"] = chain(taps, locs_p, attn_p)

    def taps_reshape_windows(lo, at):
        idx, w = M._prep_taps(shapes, lo, at, tile_base)
        idx = idx.reshape(B * H, len(shapes), NC // CB, CB, 1, M.LANE)
        w = w.reshape(B * H, len(shapes), NC // CB, CB, 1, M.LANE)
        tmin, tmax = M._tile_windows(idx)
        return (idx.astype(jnp.float32) + w
                + tmin.astype(jnp.float32)[..., None, None]
                + tmax.astype(jnp.float32)[..., None, None])
    pieces["taps+windows"] = chain(taps_reshape_windows, locs_p, attn_p)

    def epilogue(o):
        out = o[:, : loc.shape[1]].reshape(B, H, loc.shape[1], D)
        return out.transpose(0, 2, 1, 3).reshape(B, loc.shape[1], H * D)
    dummy_out = jnp.zeros((B * H, Qpad, D), jnp.float32)
    pieces["epilogue"] = chain(epilogue, dummy_out)

    pieces["full_op"] = chain(
        lambda v, lo, at: M.ms_deform_attn_pallas(v, shapes, lo, at),
        value, loc, attn)

    for k, (per, chk) in pieces.items():
        print(f"{k:15s} {per * 1e3:8.2f} ms  (chk {chk:.4g})")


if __name__ == "__main__":
    main()
