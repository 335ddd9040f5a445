"""Corner-stream Pallas TPU kernel for multi-scale deformable attention.

Second-generation layout of ``msda.py`` (same external contract, same
reference semantics — ``ms_deform_attn_cuda_kernel.cuh:238-244`` bilinear
taps with caller-side softmax).  Motivation (measured on v5e,
``tools/perf/prep_split.py``): in the first-generation kernel the XLA-side
tap build dominated the encoder-scale call — 31 ms of a 54 ms call — and
15 ms of that was purely the stride-4 *corner interleave* (``jnp.stack``
of the 4 bilinear corners into the innermost lane order (q, p, corner)),
with another ~10 ms for streaming the 274 MB folded idx/w arrays.

This kernel removes the interleave and halves the stream bytes by folding
the corners *inside* the kernel:

- XLA prep emits four NATIVE-layout streams per (batch·head, level):
  ``base`` (corner-0 flat index, int32), ``dx``/``dy`` (signed distances
  to the clamped corner, f32) and ``attn`` — pure elementwise work plus
  one H<->Q transpose of the small location arrays; no corner axis, no
  interleave, 137 MB instead of 274 MB;
- a 128-lane chunk is 32 queries x 4 points of one level (vs 8 queries x
  16 interleaved taps); per chunk the kernel folds the 4 bilinear corner
  weights (``max(1-|d|,0)`` products x attention) on (1, LANE) rows and
  derives per-corner lane/tile identities ``(base+off) & 127`` /
  ``>> 7`` with ``off in {0, 1, Wl, Wl+1}`` (Wl from SMEM);
- probes sweep the chunk's [min, max] tile window exactly as before
  (static window + two-level branchless tail); each probe loads one tile
  and select-accumulates all 4 corners, so per-QUERY lookup count is
  unchanged while the per-chunk MXU group-sum count drops 4x
  (one (32, LANE) one-hot contraction per chunk).

The backward mirrors the forward streams: per chunk it rebuilds the
corner weights, scatters ``w_c * g_q`` rows into the VMEM-resident
grad_value table via per-corner one-hot MXU contractions, and emits four
per-corner ``v_dot`` streams; grads w.r.t. locations/attention then fall
out of ``jax.vjp`` through the (tuple-valued, interleave-free) corner
weight builder, exactly as in ``msda.py``.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda import (
    LANE, _round_up, _tile_bases, _value_tables, _pad_queries,
    STATIC_PROBES, TAIL_PROBES, PROBE_PAD, _mxu_precision,
)

P_POINTS = 4           # points per (query, level); kernel-static
QPC = LANE // P_POINTS  # queries per 128-lane chunk (32)
CB = 8                  # chunks per grid step (256 queries/step)
TAIL_GROUP = 8          # chunks per tail branch (== CB, block level)


def _stream_weights(spatial_shapes, locations, weights):
    """Per-corner folded weights in native layout — the differentiable
    half of the prep (``jax.vjp`` through this yields g_loc/g_attn).

    locations (B, Q, H, L, P, 2), weights (B, Q, H, L, P) ->
    4 arrays (B, Q, H, L, P) f32 (corners 00, 01, 10, 11), plus the
    raw dx/dy distances (non-differentiated path reuses them).
    """
    ws = []
    dxy = []
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        loc = locations[:, :, :, lvl].astype(jnp.float32)
        x = loc[..., 0] * Wl - 0.5
        y = loc[..., 1] * Hl - 0.5
        xs = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, max(Wl - 2, 0))
        ys = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, max(Hl - 2, 0))
        wy0 = jnp.maximum(1.0 - jnp.abs(y - ys), 0.0)
        wy1 = jnp.maximum(1.0 - jnp.abs(y - (ys + 1)), 0.0)
        wx0 = jnp.maximum(1.0 - jnp.abs(x - xs), 0.0)
        wx1 = jnp.maximum(1.0 - jnp.abs(x - (xs + 1)), 0.0)
        attn = weights[:, :, :, lvl].astype(jnp.float32)
        ws.append((wy0 * wx0 * attn, wy0 * wx1 * attn,
                   wy1 * wx0 * attn, wy1 * wx1 * attn))
        dxy.append((x - xs, y - ys))
    return ws, dxy


def _prep_streams(spatial_shapes, locations, weights, tile_base):
    """Native-layout corner streams: base/dx/dy/attn, each
    (BH, L, NCB, CB, 1, LANE); plus per-chunk tile windows and the SMEM
    Wl table.  No corner interleave anywhere.

    The inputs are fenced with ``optimization_barrier``: when the same
    ``weights`` array also feeds the ``_stream_weights`` vjp in one
    program (the native backward), XLA:TPU miscompiles the attn stream's
    stack/reshape fusion — the kernel then receives a *wrong* ``at``
    stream (maxdiff ~0.2 on fuzzed inputs) while every other stream stays
    bitwise-exact.  Pallas is not involved: the pure-XLA repro and the
    bisect live in ``tools/perf/debug_xla_prep_miscompile.py``.  The
    barrier isolates the prep's producer fusion from the vjp's consumers
    and costs nothing (the streams are materialized as kernel operands
    anyway).  This was the round-2 "cs backward quarantine"; the dynamic
    RMW scatter originally blamed was exact all along."""
    locations, weights = jax.lax.optimization_barrier((locations, weights))
    B, Q, H, L, P, _ = locations.shape
    NC = Q * P // LANE

    def to_stream(a):
        # (B, Q, H, P) -> (BH, Q*P) in (q, p) lane order, H-major
        a = a.transpose(0, 2, 1, 3).reshape(B * H, Q * P)
        return a

    bases, dxs, dys, ats = [], [], [], []
    tmins, tmaxs = [], []
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        loc = locations[:, :, :, lvl].astype(jnp.float32)
        x = loc[..., 0] * Wl - 0.5
        y = loc[..., 1] * Hl - 0.5
        xs = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, max(Wl - 2, 0))
        ys = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, max(Hl - 2, 0))
        base = ys * Wl + xs + tile_base[lvl] * LANE      # (B, Q, H, P)
        bases.append(to_stream(base))
        dxs.append(to_stream(x - xs))
        dys.append(to_stream(y - ys))
        ats.append(to_stream(weights[:, :, :, lvl].astype(jnp.float32)))
        bq = base.reshape(B, Q // QPC, QPC, H, P)
        tmins.append(jnp.min(bq, axis=(2, 4)) // LANE)   # (B, NC', H)
        tmaxs.append((jnp.max(bq, axis=(2, 4)) + Wl + 1) // LANE)

    def fin(parts, dt):
        a = jnp.stack(parts, 1)                          # (BH, L, Q*P)
        return a.reshape(B * H, L, NC // CB, CB, 1, LANE).astype(dt)

    wshape = (B * H, L, -1, CB)
    tmin = jnp.stack(tmins, 1).transpose(0, 3, 1, 2).reshape(wshape)
    tmax = jnp.stack(tmaxs, 1).transpose(0, 3, 1, 2).reshape(wshape)
    wl = jnp.asarray([w for (_, w) in spatial_shapes], jnp.int32)
    return (fin(bases, jnp.int32), fin(dxs, jnp.float32),
            fin(dys, jnp.float32), fin(ats, jnp.float32),
            tmin.astype(jnp.int32), tmax.astype(jnp.int32), wl)


def _corner_ids(base, wl, D):
    """Per-corner in-tile lanes + tile ids from the corner-0 base."""
    ids = []
    for off in (0, 1, wl, wl + 1):
        tap = jnp.broadcast_to(base + off, (D, LANE))
        ids.append((tap & (LANE - 1), jax.lax.shift_right_logical(tap, 7)))
    return ids


# ---------------------------------------------------------------------
# bf16 x-pair packing (round 3).  The probe loop is instruction-issue
# bound (PERF_NOTES follow-up sweeps), so halving its (compare, lookup,
# select) chains is a direct win: for bf16 values, pack each token with
# its +x neighbor into one int32 lane ((v[n] bits << 16) | v[n+1] bits),
# probe with per-ROW ids (offsets {0, Wl} instead of {0, 1, Wl, Wl+1}),
# keep the accumulators packed, and unpack once per chunk — bit-exact
# (f32 bits of a bf16 are its bits << 16).  Measured at encoder scale
# (B=3 bf16): 46.7 -> 38.2 ms/call at 1px spread, 105.0 -> 83.5 at 4px,
# outputs bit-identical to the unpacked bf16 path.  f32 values keep the
# 4-corner path (two f32 cannot share a lane).
# ---------------------------------------------------------------------
def _row_ids(base, wl, D):
    """Per-ROW (y-corner) in-tile lanes + tile ids: offsets {0, Wl}."""
    ids = []
    for off in (0, wl):
        tap = jnp.broadcast_to(base + off, (D, LANE))
        ids.append((tap & (LANE - 1), jax.lax.shift_right_logical(tap, 7)))
    return ids


def _unpack_pair(acc):
    """packed int32 -> (even-corner f32, odd-corner f32), bit-exact."""
    hi = jax.lax.bitcast_convert_type(acc & jnp.int32(-65536), jnp.float32)
    lo = jax.lax.bitcast_convert_type(jax.lax.shift_left(acc, 16),
                                      jnp.float32)
    return hi, lo


def _packed_value_tables(value, spatial_shapes, T_total):
    """(B, N, H, D) bf16 -> (B*H, T, D, LANE) int32 packed-pair tables.

    Lane j of tile t holds (v[tok] << 16) | v[tok+1] as bf16 bit
    patterns; tok+1 is the next token in the level's raster (cross-tile
    pairs are correct because packing happens on the flat level stream
    before tiling; a level's last token pairs with zero pad, never
    selected — xs is clipped to W-2)."""
    B, N, H, D = value.shape
    bits = jax.lax.bitcast_convert_type(
        value.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    parts = []
    off = 0
    for (Hl, Wl) in spatial_shapes:
        n = Hl * Wl
        seg = bits[:, off:off + n]
        nxt = jnp.concatenate([seg[:, 1:], jnp.zeros_like(seg[:, :1])], 1)
        packed = (seg << 16) | nxt
        nt = _round_up(n, LANE)
        packed = jnp.pad(packed, ((0, 0), (0, nt - n), (0, 0), (0, 0)))
        parts.append(packed.reshape(B, nt // LANE, LANE, H, D))
        off += n
    tab = jnp.concatenate(parts, 1)
    tab = tab.transpose(0, 3, 1, 4, 2).reshape(B * H, T_total, D, LANE)
    return tab.astype(jnp.int32)


def _msda_cs_kernel_packed(wl_ref, tmin_ref, tmax_ref, base_ref, dx_ref,
                           dy_ref, at_ref, val_ref, out_ref, *, precision):
    """Forward over packed-pair int32 tables (bf16 values): 2 probe
    chains per chunk instead of 4; unpack once per chunk."""
    cblk = pl.program_id(1)
    l = pl.program_id(2)
    D = val_ref.shape[2]
    wl = wl_ref[l]

    @pl.when(l == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (QPC, LANE), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (QPC, LANE), 1)
    gt = (lanes // P_POINTS == rows).astype(jnp.float32)

    def chunk_parts(c):
        base = base_ref[0, 0, 0, c]
        dx = dx_ref[0, 0, 0, c]
        dy = dy_ref[0, 0, 0, c]
        at = at_ref[0, 0, 0, c]
        return _row_ids(base, wl, D), _corner_weights(dx, dy, at)

    def probe(t, ids, accs):
        tile = val_ref[0, t]
        return [jnp.where(tt == t,
                          jnp.take_along_axis(tile, lanec, axis=1), a)
                for (lanec, tt), a in zip(ids, accs)]

    def epilogue(c, accs, ws):
        a00, a01 = _unpack_pair(accs[0])
        a10, a11 = _unpack_pair(accs[1])
        acc = a00 * ws[0] + a01 * ws[1] + a10 * ws[2] + a11 * ws[3]
        part = jax.lax.dot_general(
            gt, acc, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        out_ref[0, c * QPC:(c + 1) * QPC, :] += part

    for c in range(CB):
        ids, ws = chunk_parts(c)
        tmin = tmin_ref[0, l, cblk, c]
        accs = [jnp.zeros((D, LANE), jnp.int32)] * 2
        for k in range(STATIC_PROBES):
            accs = probe(tmin + k, ids, accs)
        epilogue(c, accs, ws)

    for g0 in range(0, CB, TAIL_GROUP):
        group_overflow = jnp.zeros((), jnp.int32)
        for c in range(g0, g0 + TAIL_GROUP):
            group_overflow = jnp.maximum(
                group_overflow,
                tmax_ref[0, l, cblk, c] - tmin_ref[0, l, cblk, c])

        @pl.when(group_overflow >= STATIC_PROBES)
        def _(g0=g0):
            for c in range(g0, g0 + TAIL_GROUP):
                ids, ws = chunk_parts(c)
                tmin = tmin_ref[0, l, cblk, c]
                tmax = tmax_ref[0, l, cblk, c]
                accs = [jnp.zeros((D, LANE), jnp.int32)] * 2
                for j in range(TAIL_PROBES):
                    t = jnp.maximum(tmax - (TAIL_PROBES - 1) + j,
                                    tmin + STATIC_PROBES + j)
                    accs = probe(t, ids, accs)
                epilogue(c, accs, ws)

        @pl.when(group_overflow >= STATIC_PROBES + TAIL_PROBES)
        def _(g0=g0):
            for c in range(g0, g0 + TAIL_GROUP):
                ids, ws = chunk_parts(c)
                tmin = tmin_ref[0, l, cblk, c]
                tmax = tmax_ref[0, l, cblk, c]
                accs = jax.lax.fori_loop(
                    tmin + STATIC_PROBES, tmax - TAIL_PROBES + 1,
                    lambda t, a: tuple(probe(t, ids, list(a))),
                    (jnp.zeros((D, LANE), jnp.int32),) * 2)
                epilogue(c, list(accs), ws)


def _corner_weights(dx, dy, at):
    wx0 = jnp.maximum(1.0 - jnp.abs(dx), 0.0)
    wx1 = jnp.maximum(1.0 - jnp.abs(dx - 1.0), 0.0)
    wy0 = jnp.maximum(1.0 - jnp.abs(dy), 0.0)
    wy1 = jnp.maximum(1.0 - jnp.abs(dy - 1.0), 0.0)
    return (wy0 * wx0 * at, wy0 * wx1 * at, wy1 * wx0 * at, wy1 * wx1 * at)


def _msda_cs_kernel(wl_ref, tmin_ref, tmax_ref, base_ref, dx_ref, dy_ref,
                    at_ref, val_ref, out_ref, *, precision):
    """Grid (BH, NC//CB, L); levels fastest so each chunk-block's output
    accumulates over levels while resident (as in msda.py)."""
    cblk = pl.program_id(1)
    l = pl.program_id(2)
    D = val_ref.shape[2]
    wl = wl_ref[l]

    @pl.when(l == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (QPC, LANE), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (QPC, LANE), 1)
    gt = (lanes // P_POINTS == rows).astype(jnp.float32)

    def chunk_parts(c):
        base = base_ref[0, 0, 0, c]                 # (1, LANE) i32
        dx = dx_ref[0, 0, 0, c]
        dy = dy_ref[0, 0, 0, c]
        at = at_ref[0, 0, 0, c]
        return _corner_ids(base, wl, D), _corner_weights(dx, dy, at)

    def probe(t, ids, accs):
        tile = val_ref[0, t]                        # (D, LANE)
        return [jnp.where(tt == t, jnp.take_along_axis(tile, lanec, axis=1),
                          a)
                for (lanec, tt), a in zip(ids, accs)]

    for c in range(CB):
        ids, ws = chunk_parts(c)
        tmin = tmin_ref[0, l, cblk, c]
        accs = [jnp.zeros((D, LANE), jnp.float32)] * 4
        for k in range(STATIC_PROBES):
            accs = probe(tmin + k, ids, accs)
        acc = (accs[0] * ws[0] + accs[1] * ws[1]
               + accs[2] * ws[2] + accs[3] * ws[3])
        part = jax.lax.dot_general(
            gt, acc, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)      # (QPC, D)
        out_ref[0, c * QPC:(c + 1) * QPC, :] += part

    # two-level exact tail (see msda.py) — branch per TAIL_GROUP chunks
    for g0 in range(0, CB, TAIL_GROUP):
        group_overflow = jnp.zeros((), jnp.int32)
        for c in range(g0, g0 + TAIL_GROUP):
            group_overflow = jnp.maximum(
                group_overflow,
                tmax_ref[0, l, cblk, c] - tmin_ref[0, l, cblk, c])

        @pl.when(group_overflow >= STATIC_PROBES)
        def _(g0=g0):
            for c in range(g0, g0 + TAIL_GROUP):
                ids, ws = chunk_parts(c)
                tmin = tmin_ref[0, l, cblk, c]
                tmax = tmax_ref[0, l, cblk, c]
                accs = [jnp.zeros((D, LANE), jnp.float32)] * 4
                for j in range(TAIL_PROBES):
                    t = jnp.maximum(tmax - (TAIL_PROBES - 1) + j,
                                    tmin + STATIC_PROBES + j)
                    accs = probe(t, ids, accs)
                acc = (accs[0] * ws[0] + accs[1] * ws[1]
                       + accs[2] * ws[2] + accs[3] * ws[3])
                part = jax.lax.dot_general(
                    gt, acc, dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32)
                out_ref[0, c * QPC:(c + 1) * QPC, :] += part

        @pl.when(group_overflow >= STATIC_PROBES + TAIL_PROBES)
        def _(g0=g0):
            for c in range(g0, g0 + TAIL_GROUP):
                ids, ws = chunk_parts(c)
                tmin = tmin_ref[0, l, cblk, c]
                tmax = tmax_ref[0, l, cblk, c]

                def tile_body(t, accs):
                    return tuple(probe(t, ids, list(accs)))

                accs = jax.lax.fori_loop(
                    tmin + STATIC_PROBES, tmax - TAIL_PROBES + 1, tile_body,
                    (jnp.zeros((D, LANE), jnp.float32),) * 4)
                acc = (accs[0] * ws[0] + accs[1] * ws[1]
                       + accs[2] * ws[2] + accs[3] * ws[3])
                part = jax.lax.dot_general(
                    gt, acc, dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32)
                out_ref[0, c * QPC:(c + 1) * QPC, :] += part


def _stream_specs(L, NCB, Tp, D):
    smem_w = pl.BlockSpec((L,), lambda bh, c, l: (0,),
                          memory_space=pltpu.SMEM)
    smem = pl.BlockSpec((1, L, NCB, CB), lambda bh, c, l: (bh, 0, 0, 0),
                        memory_space=pltpu.SMEM)
    stream = pl.BlockSpec((1, 1, 1, CB, 1, LANE),
                          lambda bh, c, l: (bh, l, c, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    table = pl.BlockSpec((1, Tp, D, LANE), lambda bh, c, l: (bh, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    return smem_w, smem, stream, table


def _forward(value, spatial_shapes, sampling_locations, attention_weights):
    B, N, H, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(spatial_shapes)
    P = sampling_locations.shape[4]
    assert P == P_POINTS, f"P={P}: corner-stream kernel assumes P == 4"

    tile_base, T_total = _tile_bases(spatial_shapes)
    # bf16 values: packed x-pair tables halve the probe loop's
    # (compare, lookup, select) chains — bit-identical outputs (see the
    # packing block above).  f32 keeps the exact 4-corner path.
    packed = value.dtype == jnp.bfloat16
    if packed:
        val = _packed_value_tables(value, spatial_shapes, T_total)
        kern = _msda_cs_kernel_packed
    else:
        val = _value_tables(value, spatial_shapes, T_total)
        kern = _msda_cs_kernel
    val = jnp.pad(val, ((0, 0), (0, PROBE_PAD), (0, 0), (0, 0)))
    Tp = T_total + PROBE_PAD

    sampling_locations, attention_weights, Qpad = _pad_queries(
        sampling_locations, attention_weights)
    # _pad_queries rounds to msda.py's chunk geometry (8q x CB=32 = 256);
    # ours is 32q x CB=8 = 256 — identical granularity, reuse as-is.
    NC = Qpad * P // LANE
    base, dx, dy, at, tmin, tmax, wl = _prep_streams(
        spatial_shapes, sampling_locations, attention_weights, tile_base)

    smem_w, smem, stream, table = _stream_specs(L, NC // CB, Tp, D)
    out = pl.pallas_call(
        functools.partial(kern, precision=_mxu_precision(value)),
        grid=(B * H, NC // CB, L),
        in_specs=[smem_w, smem, smem, stream, stream, stream, stream,
                  table],
        out_specs=pl.BlockSpec((1, QPC * CB, D),
                               lambda bh, c, l: (bh, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Qpad, D), jnp.float32),
    )(wl, tmin, tmax, base, dx, dy, at, val)

    out = out[:, :Q].reshape(B, H, Q, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, H * D).astype(value.dtype)


def _msda_cs_bwd_kernel(wl_ref, tmin_ref, tmax_ref, base_ref, dx_ref,
                        dy_ref, at_ref, val_ref, g_ref, vdot_ref, gval_ref,
                        *, precision):
    """Fused backward: per-corner value dots + grad_value scatter.

    ``gval_ref`` stays VMEM-resident per BH and accumulates across all
    (chunk-block, level) steps; ``vdot_ref`` holds one (1, LANE) row per
    (chunk, corner) — corner minor, i.e. row ``c*4 + corner``."""
    cblk = pl.program_id(1)
    l = pl.program_id(2)
    D = val_ref.shape[2]
    wl = wl_ref[l]

    @pl.when((pl.program_id(1) == 0) & (l == 0))
    def _():
        gval_ref[...] = jnp.zeros_like(gval_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (QPC, LANE), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (QPC, LANE), 1)
    gt = (lanes // P_POINTS == rows).astype(jnp.float32)
    lane_j = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)

    def chunk_parts(c):
        base = base_ref[0, 0, 0, c]
        dx = dx_ref[0, 0, 0, c]
        dy = dy_ref[0, 0, 0, c]
        at = at_ref[0, 0, 0, c]
        ids = _corner_ids(base, wl, D)
        ws = _corner_weights(dx, dy, at)
        g8 = g_ref[0, c * QPC:(c + 1) * QPC, :]      # (QPC, D)
        # per-(q,p)-lane incoming-grad rows: R[d, k] = g8[k // P, d]
        R = jax.lax.dot_general(
            g8, gt, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)       # (D, LANE)
        # probe-invariant per-corner scatter one-hots + weighted rows
        ohs = [(lanec[0:1] == lane_j) for (lanec, _) in ids]
        Rws = [R * w for w in ws]
        return ids, ws, ohs, R, Rws

    def probe(t, ids, ohs, Rws, gvaccs):
        tile = val_ref[0, t]
        outs = []
        contrib = None
        for (lanec, tt), ohl, Rw, gv in zip(ids, ohs, Rws, gvaccs):
            hit = tt == t
            outs.append(jnp.where(
                hit, jnp.take_along_axis(tile, lanec, axis=1), gv))
            oh = (ohl & hit[0:1]).astype(jnp.float32)
            part = jax.lax.dot_general(
                Rw, oh, dimension_numbers=(((1,), (1,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32)
            contrib = part if contrib is None else contrib + part
        # ONE read-modify-write of the dynamic slice per probe: Mosaic
        # miscompiles (and it is slower anyway) when the same dynamic
        # gval row gets 4 consecutive accumulates.
        gval_ref[0, t] += contrib
        return outs

    def flush_vdot(c, gvaccs, R, acc=False):
        # One (1, LANE) row per (chunk, corner) — msda.py's proven layout.
        # A (4, LANE) sub-block write here miscompiles on Mosaic and
        # corrupts the co-resident gval table (ablation: stubbing these
        # writes made gval exact).
        for j, gv in enumerate(gvaccs):
            vd = jnp.sum(gv * R, axis=0, keepdims=True)
            if acc:
                vdot_ref[0, 0, 0, c * 4 + j] += vd
            else:
                vdot_ref[0, 0, 0, c * 4 + j] = vd

    for c in range(CB):
        ids, ws, ohs, R, Rws = chunk_parts(c)
        tmin = tmin_ref[0, l, cblk, c]
        gvaccs = [jnp.zeros((D, LANE), jnp.float32)] * 4
        for k in range(STATIC_PROBES):
            gvaccs = probe(tmin + k, ids, ohs, Rws, gvaccs)
        flush_vdot(c, gvaccs, R)

    for g0 in range(0, CB, TAIL_GROUP):
        group_overflow = jnp.zeros((), jnp.int32)
        for c in range(g0, g0 + TAIL_GROUP):
            group_overflow = jnp.maximum(
                group_overflow,
                tmax_ref[0, l, cblk, c] - tmin_ref[0, l, cblk, c])

        @pl.when(group_overflow >= STATIC_PROBES)
        def _(g0=g0):
            for c in range(g0, g0 + TAIL_GROUP):
                ids, ws, ohs, R, Rws = chunk_parts(c)
                tmin = tmin_ref[0, l, cblk, c]
                tmax = tmax_ref[0, l, cblk, c]
                gvaccs = [jnp.zeros((D, LANE), jnp.float32)] * 4
                for j in range(TAIL_PROBES):
                    t = jnp.maximum(tmax - (TAIL_PROBES - 1) + j,
                                    tmin + STATIC_PROBES + j)
                    gvaccs = probe(t, ids, ohs, Rws, gvaccs)
                flush_vdot(c, gvaccs, R, acc=True)

        @pl.when(group_overflow >= STATIC_PROBES + TAIL_PROBES)
        def _(g0=g0):
            for c in range(g0, g0 + TAIL_GROUP):
                ids, ws, ohs, R, Rws = chunk_parts(c)
                tmin = tmin_ref[0, l, cblk, c]
                tmax = tmax_ref[0, l, cblk, c]
                gvaccs = jax.lax.fori_loop(
                    tmin + STATIC_PROBES, tmax - TAIL_PROBES + 1,
                    lambda t, gv: tuple(probe(t, ids, ohs, Rws, list(gv))),
                    (jnp.zeros((D, LANE), jnp.float32),) * 4)
                flush_vdot(c, list(gvaccs), R, acc=True)


def _msda_cs_bwd_kernel_packed(wl_ref, tmin_ref, tmax_ref, base_ref,
                               dx_ref, dy_ref, at_ref, val_ref, g_ref,
                               vdot_ref, gval_ref, *, precision):
    """Backward over packed-pair int32 tables (bf16 values): the probe's
    value READS use 2 packed chains (row ids) instead of 4; the
    grad_value SCATTER keeps exact per-corner (tile, lane) one-hots —
    packing does not apply to writes.  Bit-identical to the unpacked
    bf16 backward."""
    cblk = pl.program_id(1)
    l = pl.program_id(2)
    D = val_ref.shape[2]
    wl = wl_ref[l]

    @pl.when((pl.program_id(1) == 0) & (l == 0))
    def _():
        gval_ref[...] = jnp.zeros_like(gval_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (QPC, LANE), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (QPC, LANE), 1)
    gt = (lanes // P_POINTS == rows).astype(jnp.float32)
    lane_j = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)

    def chunk_parts(c):
        base = base_ref[0, 0, 0, c]
        dx = dx_ref[0, 0, 0, c]
        dy = dy_ref[0, 0, 0, c]
        at = at_ref[0, 0, 0, c]
        rids = _row_ids(base, wl, D)
        cids = _corner_ids(base, wl, D)
        ws = _corner_weights(dx, dy, at)
        g8 = g_ref[0, c * QPC:(c + 1) * QPC, :]
        R = jax.lax.dot_general(
            g8, gt, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        ohs = [(lanec[0:1] == lane_j) for (lanec, _) in cids]
        Rws = [R * w for w in ws]
        return rids, cids, ohs, R, Rws

    def probe(t, rids, cids, ohs, Rws, gvaccs):
        tile = val_ref[0, t]
        outs = [jnp.where(tt == t,
                          jnp.take_along_axis(tile, lanec, axis=1), gv)
                for (lanec, tt), gv in zip(rids, gvaccs)]
        contrib = None
        for (_, tt), ohl, Rw in zip(cids, ohs, Rws):
            hit = tt == t
            oh = (ohl & hit[0:1]).astype(jnp.float32)
            part = jax.lax.dot_general(
                Rw, oh, dimension_numbers=(((1,), (1,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
            contrib = part if contrib is None else contrib + part
        gval_ref[0, t] += contrib
        return outs

    def flush_vdot(c, gvaccs, R, acc=False):
        a00, a01 = _unpack_pair(gvaccs[0])
        a10, a11 = _unpack_pair(gvaccs[1])
        for j, gv in enumerate((a00, a01, a10, a11)):
            vd = jnp.sum(gv * R, axis=0, keepdims=True)
            if acc:
                vdot_ref[0, 0, 0, c * 4 + j] += vd
            else:
                vdot_ref[0, 0, 0, c * 4 + j] = vd

    for c in range(CB):
        rids, cids, ohs, R, Rws = chunk_parts(c)
        tmin = tmin_ref[0, l, cblk, c]
        gvaccs = [jnp.zeros((D, LANE), jnp.int32)] * 2
        for k in range(STATIC_PROBES):
            gvaccs = probe(tmin + k, rids, cids, ohs, Rws, gvaccs)
        flush_vdot(c, gvaccs, R)

    for g0 in range(0, CB, TAIL_GROUP):
        group_overflow = jnp.zeros((), jnp.int32)
        for c in range(g0, g0 + TAIL_GROUP):
            group_overflow = jnp.maximum(
                group_overflow,
                tmax_ref[0, l, cblk, c] - tmin_ref[0, l, cblk, c])

        @pl.when(group_overflow >= STATIC_PROBES)
        def _(g0=g0):
            for c in range(g0, g0 + TAIL_GROUP):
                rids, cids, ohs, R, Rws = chunk_parts(c)
                tmin = tmin_ref[0, l, cblk, c]
                tmax = tmax_ref[0, l, cblk, c]
                gvaccs = [jnp.zeros((D, LANE), jnp.int32)] * 2
                for j in range(TAIL_PROBES):
                    t = jnp.maximum(tmax - (TAIL_PROBES - 1) + j,
                                    tmin + STATIC_PROBES + j)
                    gvaccs = probe(t, rids, cids, ohs, Rws, gvaccs)
                flush_vdot(c, gvaccs, R, acc=True)

        @pl.when(group_overflow >= STATIC_PROBES + TAIL_PROBES)
        def _(g0=g0):
            for c in range(g0, g0 + TAIL_GROUP):
                rids, cids, ohs, R, Rws = chunk_parts(c)
                tmin = tmin_ref[0, l, cblk, c]
                tmax = tmax_ref[0, l, cblk, c]
                gvaccs = jax.lax.fori_loop(
                    tmin + STATIC_PROBES, tmax - TAIL_PROBES + 1,
                    lambda t, gv: tuple(probe(t, rids, cids, ohs, Rws,
                                              list(gv))),
                    (jnp.zeros((D, LANE), jnp.int32),) * 2)
                flush_vdot(c, list(gvaccs), R, acc=True)


def _backward(value, spatial_shapes, sampling_locations, attention_weights,
              g):
    B, N, H, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(spatial_shapes)

    tile_base, T_total = _tile_bases(spatial_shapes)
    packed = value.dtype == jnp.bfloat16
    if packed:
        val = _packed_value_tables(value, spatial_shapes, T_total)
        bwd_kern = _msda_cs_bwd_kernel_packed
    else:
        val = _value_tables(value, spatial_shapes, T_total)
        bwd_kern = _msda_cs_bwd_kernel
    val = jnp.pad(val, ((0, 0), (0, PROBE_PAD), (0, 0), (0, 0)))
    Tp = T_total + PROBE_PAD
    locs_p, attn_p, Qpad = _pad_queries(sampling_locations,
                                        attention_weights)
    NC = Qpad * P_POINTS // LANE
    base, dx, dy, at, tmin, tmax, wl = _prep_streams(
        spatial_shapes, locs_p, attn_p, tile_base)
    g_bh = g.reshape(B, Q, H, D).transpose(0, 2, 1, 3).reshape(
        B * H, Q, D).astype(jnp.float32)
    g_bh = jnp.pad(g_bh, ((0, 0), (0, Qpad - Q), (0, 0)))

    smem_w, smem, stream, table = _stream_specs(L, NC // CB, Tp, D)
    vdot, gval = pl.pallas_call(
        functools.partial(bwd_kern, precision=_mxu_precision(value)),
        grid=(B * H, NC // CB, L),
        in_specs=[smem_w, smem, smem, stream, stream, stream, stream,
                  table,
                  pl.BlockSpec((1, QPC * CB, D),
                               lambda bh, c, l: (bh, c, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, 1, 1, CB * 4, 1, LANE),
                         lambda bh, c, l: (bh, l, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            table,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, L, NC // CB, CB * 4, 1, LANE),
                                 jnp.float32),
            jax.ShapeDtypeStruct((B * H, Tp, D, LANE), jnp.float32),
        ),
    )(wl, tmin, tmax, base, dx, dy, at, val, g_bh)
    gval = gval[:, :T_total]

    # unpack grad_value tables back to (B, N, H, D) — same as msda.py
    gval = gval.reshape(B, H, T_total, D, LANE)
    parts = []
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        n = Hl * Wl
        nt = _round_up(n, LANE) // LANE
        v = gval[:, :, tile_base[lvl]:tile_base[lvl] + nt]
        v = v.transpose(0, 1, 3, 2, 4).reshape(B, H, D, nt * LANE)[..., :n]
        parts.append(v)
    g_val = jnp.concatenate(parts, -1).transpose(0, 3, 1, 2).astype(
        value.dtype)

    # grads w.r.t. locations / attention: vjp through the per-corner
    # folded-weight builder (tuple-valued, native layout, NO interleave)
    # contracted with the kernel's per-corner value dots.  Tap indices are
    # piecewise-constant in the locations, so this is exact (msda.py).
    def wfun(lo, at_):
        ws, _ = _stream_weights(spatial_shapes, lo, at_)
        return tuple(w for lvl_ws in ws for w in lvl_ws)  # L*4 arrays

    _, vjp_w = jax.vjp(wfun, locs_p, attn_p)
    # vdot (BH, L, NCB, CB, 4, LANE) -> per (level, corner) cotangents in
    # native (B, Q, H, P) layout
    vd = vdot.reshape(B, H, L, -1, 4, LANE)
    cts = []
    for lvl in range(L):
        for corner in range(4):
            c = vd[:, :, lvl, :, corner, :].reshape(B, H, Qpad, P_POINTS)
            cts.append(c.transpose(0, 2, 1, 3))          # (B, Q, H, P)
    g_loc_p, g_attn_p = vjp_w(tuple(cts))
    g_loc = g_loc_p[:, :Q].astype(sampling_locations.dtype)
    g_attn = g_attn_p[:, :Q].astype(attention_weights.dtype)
    return g_val, g_loc, g_attn


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_cs(value, spatial_shapes, sampling_locations,
                      attention_weights):
    """Same contract as ``ms_deform_attn_xla``; corner-stream Pallas TPU
    forward (P=4 only)."""
    return _forward(value, spatial_shapes, sampling_locations,
                    attention_weights)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = _forward(value, spatial_shapes, sampling_locations,
                   attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, res, g):
    value, locs, weights = res
    # Native corner-stream backward.  The round-2 quarantine ("dynamic
    # gval RMW miscompiles") is lifted: the real culprit was an XLA:TPU
    # fusion miscompile of the XLA-side attn-stream prep whenever the
    # same weights fed the _stream_weights vjp in one program — the
    # kernel's scatter was exact all along.  _prep_streams now fences its
    # inputs with optimization_barrier (see its docstring and
    # tools/perf/debug_xla_prep_miscompile.py for the pure-XLA repro).
    return _backward(value, spatial_shapes, locs, weights, g)


ms_deform_attn_cs.defvjp(_fwd, _bwd)
