"""Ablation variants of the Pallas msda forward, for cost attribution.

Each variant removes one piece of the per-chunk work (results become wrong
— this is a cost probe, not a correctness path):

  full     — the shipped kernel structure (reference point)
  nomxu    — skip the one-hot MXU contraction (out += sliced acc)
  nolookup — skip take_along_axis+mask (use the probed tile directly)
  statict  — probe static tiles 0..3 (no SMEM window read / dynamic addr)
  notail   — drop the hoisted overflow tail entirely
  noout    — skip the out_ref update (accumulate into a dummy)
  noload   — load ONE tile per chunk, probe it 4x (isolates VMEM loads)
  noprobe  — skip the probe loop (acc = broadcast w): per-chunk overhead
             + MXU + out only
  preponly — kernel writes zeros once: XLA prep (tap build, value tables,
             windows) + pallas launch cost only

Run: python tools/perf/msda_ablate.py [--abl full,nomxu,...] [--iters 11]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_forward(abl: str):
    from pavenet_tpu.ops.pallas import msda as M

    LANE, GROUP, QPC, CB = M.LANE, M.GROUP, M.QPC, M.CB
    SP = M.STATIC_PROBES

    def kernel(tmin_ref, tmax_ref, idx_ref, w_ref, val_ref, out_ref):
        cblk = pl.program_id(1)
        l = pl.program_id(2)
        D = val_ref.shape[2]

        @pl.when(l == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        rows = jax.lax.broadcasted_iota(jnp.int32, (QPC, LANE), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (QPC, LANE), 1)
        gt = (lanes // GROUP == rows).astype(jnp.float32)

        TP, TG = M.TAIL_PROBES, M.TAIL_GROUP

        if abl == "preponly":
            return

        for c in range(CB):
            taps = idx_ref[0, 0, 0, c]
            w = w_ref[0, 0, 0, c]
            taps_b = jnp.broadcast_to(taps, (D, LANE))
            lanec = taps_b & (LANE - 1)
            tt = jax.lax.shift_right_logical(taps_b, 7)
            tmin = tmin_ref[0, l, cblk, c]

            acc = jnp.zeros((D, LANE), jnp.float32)
            tile0 = val_ref[0, tmin] if abl == "noload" else None
            for k in range(0 if abl == "noprobe" else SP):
                t = k if abl == "statict" else tmin + k
                tile = tile0 if abl == "noload" else val_ref[0, t]
                if abl == "nolookup":
                    acc = acc + tile.astype(jnp.float32)
                else:
                    g = jnp.take_along_axis(tile, lanec, axis=1)
                    acc = jnp.where(tt == t, g, acc)
            acc = acc * w
            if abl == "nomxu":
                part = acc[0:QPC, 0:D]
            else:
                part = jax.lax.dot_general(
                    gt, acc, dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
            if abl != "noout":
                out_ref[0, c * QPC:(c + 1) * QPC, :] += part
            else:
                out_ref[0, 0:QPC, :] += part

        if abl not in ("notail", "statict", "noload", "noprobe"):
            for g0 in range(0, CB, TG):
                group_overflow = jnp.zeros((), jnp.int32)
                for c in range(g0, g0 + TG):
                    group_overflow = jnp.maximum(
                        group_overflow,
                        tmax_ref[0, l, cblk, c] - tmin_ref[0, l, cblk, c])

                @pl.when(group_overflow >= SP)
                def _(g0=g0):
                    for c in range(g0, g0 + TG):
                        taps = idx_ref[0, 0, 0, c]
                        w = w_ref[0, 0, 0, c]
                        taps_b = jnp.broadcast_to(taps, (D, LANE))
                        lanec = taps_b & (LANE - 1)
                        tt = jax.lax.shift_right_logical(taps_b, 7)
                        tmin = tmin_ref[0, l, cblk, c]
                        tmax = tmax_ref[0, l, cblk, c]

                        acc = jnp.zeros((D, LANE), jnp.float32)
                        for j in range(TP):
                            t = jnp.maximum(tmax - (TP - 1) + j,
                                            tmin + SP + j)
                            tile = val_ref[0, t]
                            g = jnp.take_along_axis(tile, lanec, axis=1)
                            acc = jnp.where(tt == t, g, acc)
                        part = jax.lax.dot_general(
                            gt, acc * w,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
                        out_ref[0, c * QPC:(c + 1) * QPC, :] += part

                @pl.when(group_overflow >= SP + TP)
                def _(g0=g0):
                    for c in range(g0, g0 + TG):
                        taps = idx_ref[0, 0, 0, c]
                        w = w_ref[0, 0, 0, c]
                        taps_b = jnp.broadcast_to(taps, (D, LANE))
                        lanec = taps_b & (LANE - 1)
                        tt = jax.lax.shift_right_logical(taps_b, 7)
                        tmin = tmin_ref[0, l, cblk, c]
                        tmax = tmax_ref[0, l, cblk, c]

                        def tile_body(t, a):
                            tile = val_ref[0, t]
                            g = jnp.take_along_axis(tile, lanec, axis=1)
                            return jnp.where(tt == t, g, a)

                        extra = jax.lax.fori_loop(
                            tmin + SP, tmax - TP + 1, tile_body,
                            jnp.zeros((D, LANE), jnp.float32))
                        part = jax.lax.dot_general(
                            gt, extra * w,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
                        out_ref[0, c * QPC:(c + 1) * QPC, :] += part

    def forward(value, spatial_shapes, locs, attn):
        B, N, H, D = value.shape
        Q = locs.shape[1]
        L = len(spatial_shapes)
        tile_base, T_total = M._tile_bases(spatial_shapes)
        val = M._value_tables(value, spatial_shapes, T_total)
        val = jnp.pad(val, ((0, 0), (0, M.PROBE_PAD), (0, 0), (0, 0)))
        Tp = T_total + M.PROBE_PAD
        locs, attn, Qpad = M._pad_queries(locs, attn)
        NC = Qpad * GROUP // LANE
        idx, w = M._prep_taps(spatial_shapes, locs, attn, tile_base)
        idx = idx.reshape(B * H, L, NC // CB, CB, 1, LANE)
        w = w.reshape(B * H, L, NC // CB, CB, 1, LANE)
        tmin, tmax = M._chunk_windows(spatial_shapes, locs, tile_base)
        out = pl.pallas_call(
            kernel,
            grid=(B * H, NC // CB, L),
            in_specs=[
                pl.BlockSpec((1, L, NC // CB, CB),
                             lambda bh, c, l: (bh, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, L, NC // CB, CB),
                             lambda bh, c, l: (bh, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, CB, 1, LANE),
                             lambda bh, c, l: (bh, l, c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, CB, 1, LANE),
                             lambda bh, c, l: (bh, l, c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Tp, D, LANE),
                             lambda bh, c, l: (bh, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, QPC * CB, D),
                                   lambda bh, c, l: (bh, c, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, Qpad, D), jnp.float32),
        )(tmin, tmax, idx, w, val)
        out = out[:, :Q].reshape(B, H, Q, D).transpose(0, 2, 1, 3)
        return out.reshape(B, Q, H * D).astype(value.dtype)

    return forward


def main():
    from bench_msda import encoder_shapes, make_inputs, bench
    ap = argparse.ArgumentParser()
    ap.add_argument("--abl", default="full,nomxu,nolookup,statict,notail")
    ap.add_argument("--iters", type=int, default=11)
    ap.add_argument("--bucket", default="800x1344")
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--cb", type=int, default=0,
                    help="override msda.CB (chunks per grid step)")
    args = ap.parse_args()
    if args.cb:
        from pavenet_tpu.ops.pallas import msda as _M
        _M.CB = args.cb
    hh, ww = (int(x) for x in args.bucket.split("x"))
    shapes = encoder_shapes(hh, ww)
    value, loc, attn = make_inputs(shapes, B=args.batch)
    print(f"# backend={jax.default_backend()} shapes={shapes}")
    for abl in args.abl.split(","):
        fwd = build_forward(abl)
        call = lambda v, l, a: fwd(v, shapes, l, a)
        t0 = time.perf_counter()
        per, val = bench(call, value, loc, attn, args.iters)
        wall = time.perf_counter() - t0
        print(f"{abl:10s} {per * 1e3:8.2f} ms/call  (chk {val:.4g}, "
              f"wall {wall:.0f}s)")


if __name__ == "__main__":
    main()
