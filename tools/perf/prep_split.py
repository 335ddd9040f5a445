"""Split the msda prep cost at the pallas boundary.

Variants run the SHIPPED forward pallas_call (empty-body twin) with some
prep pieces precomputed outside the jit (passed as arguments), so the
in-graph cost of each piece — including any layout copies XLA inserts at
the custom-call boundary — is isolated:

  all_in    — full prep inside (== msda_ablate preponly)
  pre_taps  — idx/w/tmin/tmax precomputed; value tables built inside
  pre_val   — value tables precomputed; taps/windows built inside
  pre_all   — everything precomputed (== launch floor)

Run: python tools/perf/prep_split.py [--iters 11]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    L = len(shapes)
    tile_base, T_total = M._tile_bases(shapes)
    Tp = T_total + M.PROBE_PAD
    CB, QPC, LANE = M.CB, M.QPC, M.LANE

    locs_p, attn_p, Qpad = M._pad_queries(loc, attn)
    NC = Qpad * M.GROUP // LANE

    def build_val(v):
        val = M._value_tables(v, shapes, T_total)
        return jnp.pad(val, ((0, 0), (0, M.PROBE_PAD), (0, 0), (0, 0)))

    def build_taps(lo, at):
        idx, w = M._prep_taps(shapes, lo, at, tile_base)
        idx = idx.reshape(B * H, L, NC // CB, CB, 1, LANE)
        w = w.reshape(B * H, L, NC // CB, CB, 1, LANE)
        tmin, tmax = M._tile_windows(idx)
        return idx, w, tmin, tmax

    def empty_kernel(*refs):
        out_ref = refs[-1]

        @pl.when(pl.program_id(2) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

    call = pl.pallas_call(
        empty_kernel,
        grid=(B * H, NC // CB, L),
        in_specs=[
            pl.BlockSpec((1, L, NC // CB, CB), lambda bh, c, l: (bh, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, L, NC // CB, CB), lambda bh, c, l: (bh, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, CB, 1, LANE),
                         lambda bh, c, l: (bh, l, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, CB, 1, LANE),
                         lambda bh, c, l: (bh, l, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, D, LANE), lambda bh, c, l: (bh, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, QPC * CB, D), lambda bh, c, l: (bh, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Qpad, D), jnp.float32),
    )

    val_pre = jax.jit(build_val)(value)
    idx_pre, w_pre, tmin_pre, tmax_pre = jax.jit(build_taps)(locs_p, attn_p)

    variants = {
        "all_in": (lambda v, lo, at: call(*build_taps(lo, at)[2:],
                                          *build_taps(lo, at)[:2],
                                          build_val(v)),
                   (value, locs_p, attn_p)),
        "pre_taps": (lambda v, i, w, tn, tx: call(tn, tx, i, w,
                                                  build_val(v)),
                     (value, idx_pre, w_pre, tmin_pre, tmax_pre)),
        "pre_val": (lambda vt, lo, at: (lambda t: call(t[2], t[3], t[0],
                                                       t[1], vt))(
                                           build_taps(lo, at)),
                    (val_pre, locs_p, attn_p)),
        "pre_all": (lambda vt, i, w, tn, tx: call(tn, tx, i, w, vt),
                    (val_pre, idx_pre, w_pre, tmin_pre, tmax_pre)),
    }

    def fix_all_in(v, lo, at):
        idx, w, tmin, tmax = build_taps(lo, at)
        return call(tmin, tmax, idx, w, build_val(v))
    variants["all_in"] = (fix_all_in, (value, locs_p, attn_p))

    def build_taps_cw(lo, at):
        """Shipped path: windows from native layout (_chunk_windows)."""
        idx, w = M._prep_taps(shapes, lo, at, tile_base)
        idx = idx.reshape(B * H, L, NC // CB, CB, 1, LANE)
        w = w.reshape(B * H, L, NC // CB, CB, 1, LANE)
        tmin, tmax = M._chunk_windows(shapes, lo, tile_base)
        return idx, w, tmin, tmax

    def shipped(v, lo, at):
        idx, w, tmin, tmax = build_taps_cw(lo, at)
        return call(tmin, tmax, idx, w, build_val(v))
    variants["shipped"] = (shipped, (value, locs_p, attn_p))

    def t_first(v, lo, at):
        """Transpose loc/attn H<->Q FIRST (103 MB), then build idx/w with
        NO big transpose — isolates transpose vs corner-interleave cost."""
        lo_t = lo.transpose(0, 2, 1, 3, 4, 5)   # (B, H, Q, L, P, 2)
        at_t = at.transpose(0, 2, 1, 3, 4)      # (B, H, Q, L, P)
        idx_all, w_all = [], []
        for lvl, (Hl, Wl) in enumerate(shapes):
            locv = lo_t[:, :, :, lvl].astype(jnp.float32)
            x = locv[..., 0] * Wl - 0.5
            y = locv[..., 1] * Hl - 0.5
            x0 = jnp.floor(x).astype(jnp.int32)
            y0 = jnp.floor(y).astype(jnp.int32)
            ys = jnp.clip(y0, 0, max(Hl - 2, 0))
            xs = jnp.clip(x0, 0, max(Wl - 2, 0))
            wy0 = jnp.maximum(1.0 - jnp.abs(y - ys), 0.0)
            wy1 = jnp.maximum(1.0 - jnp.abs(y - (ys + 1)), 0.0)
            wx0 = jnp.maximum(1.0 - jnp.abs(x - xs), 0.0)
            wx1 = jnp.maximum(1.0 - jnp.abs(x - (xs + 1)), 0.0)
            atv = at_t[:, :, :, lvl].astype(jnp.float32)
            base = ys * Wl + xs + tile_base[lvl] * LANE
            idx = jnp.stack([base, base + 1, base + Wl, base + Wl + 1], -1)
            w = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1],
                          -1) * atv[..., None]
            idx_all.append(idx.reshape(B, H, -1))
            w_all.append(w.reshape(B, H, -1))
        idx = jnp.stack(idx_all, 2).reshape(B * H, L, NC // CB, CB, 1, LANE)
        w = jnp.stack(w_all, 2).reshape(B * H, L, NC // CB, CB, 1, LANE)
        tmin, tmax = M._chunk_windows(shapes, lo, tile_base)
        return call(tmin, tmax, idx, w, build_val(v))
    variants["t_first"] = (t_first, (value, locs_p, attn_p))

    def nointerleave(v, lo, at):
        """t_first but corners CONCATENATED per level (wrong tap order —
        timing only): isolates the stride-4 corner interleave cost."""
        lo_t = lo.transpose(0, 2, 1, 3, 4, 5)
        at_t = at.transpose(0, 2, 1, 3, 4)
        idx_all, w_all = [], []
        for lvl, (Hl, Wl) in enumerate(shapes):
            locv = lo_t[:, :, :, lvl].astype(jnp.float32)
            x = locv[..., 0] * Wl - 0.5
            y = locv[..., 1] * Hl - 0.5
            ys = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, max(Hl - 2, 0))
            xs = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, max(Wl - 2, 0))
            wy0 = jnp.maximum(1.0 - jnp.abs(y - ys), 0.0)
            wx0 = jnp.maximum(1.0 - jnp.abs(x - xs), 0.0)
            atv = at_t[:, :, :, lvl].astype(jnp.float32)
            base = ys * Wl + xs + tile_base[lvl] * LANE
            idx = jnp.concatenate(
                [base, base + 1, base + Wl, base + Wl + 1], -1)
            w = jnp.concatenate([wy0 * wx0] * 4, -1) * jnp.concatenate(
                [atv] * 4, -1)
            idx_all.append(idx.reshape(B, H, -1))
            w_all.append(w.reshape(B, H, -1))
        idx = jnp.stack(idx_all, 2).reshape(B * H, L, NC // CB, CB, 1, LANE)
        w = jnp.stack(w_all, 2).reshape(B * H, L, NC // CB, CB, 1, LANE)
        tmin, tmax = M._chunk_windows(shapes, lo, tile_base)
        return call(tmin, tmax, idx, w, build_val(v))
    variants["nointerlv"] = (nointerleave, (value, locs_p, attn_p))

    for name, (fn, ops) in variants.items():
        def loop(*xs):
            def body(c, _):
                shifted = [x + c * 0.0 if jnp.issubdtype(x.dtype,
                                                         jnp.floating)
                           else x for x in xs]
                o = fn(*shifted)
                return o.reshape(-1)[0], None
            c, _ = jax.lax.scan(body, jnp.float32(0), None,
                                length=args.iters)
            return c
        f = jax.jit(loop)
        float(np.asarray(f(*ops)))
        t0 = time.perf_counter()
        float(np.asarray(f(*ops)))
        per = (time.perf_counter() - t0) / args.iters
        print(f"{name:10s} {per * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
