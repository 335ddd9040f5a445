"""Prototype: x-adjacent bf16 pair packing for the corner-stream kernel.

The cs main loop is instruction-issue-bound (PERF_NOTES follow-up
sweeps): each probe runs 4x (compare, lane-lookup, select) — one chain
per bilinear corner.  Corners (00, 01) and (10, 11) are x-adjacent
tokens, so for bf16 values we can pack v[n] and v[n+1] into one int32
lane (bf16 bits hi/lo), probe a PACKED table with per-ROW ids
(offsets {0, Wl} instead of {0, 1, Wl, Wl+1}), keep the accumulators
packed through the probe loop, and unpack once per chunk:

    per probe: 2x (compare, lookup, select)   [was 4x]
    per chunk: +4 unpack ops (shift/mask + bitcast)

Numerically exact: the unpacked f32 values are the bf16 values
bit-exactly (f32bits = bf16bits << 16).

This harness measures the packed FORWARD against the shipped cs forward
at encoder scale on fuzzed bf16 inputs and checks exactness.
"""
import argparse
import functools
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

from pavenet_tpu.ops.pallas.msda import (
    LANE, _round_up, _tile_bases, _pad_queries, STATIC_PROBES, TAIL_PROBES,
    PROBE_PAD, _mxu_precision)
from pavenet_tpu.ops.pallas import msda_cs
from pavenet_tpu.ops.pallas.msda_cs import (
    P_POINTS, QPC, CB, TAIL_GROUP, _prep_streams, _stream_specs,
    _corner_weights)


def _packed_value_tables(value, spatial_shapes, T_total):
    """(B, N, H, D) bf16 -> (B*H, T, D, LANE) int32 packed pair tables:
    lane j of tile t holds (v[tok] bits << 16) | v[tok+1] bits, with
    tok+1 taken within the level's padded token stream (the pack partner
    of a level's last token is the zero pad — never selected, xs is
    clipped to W-2)."""
    B, N, H, D = value.shape
    bits = jax.lax.bitcast_convert_type(
        value.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    parts = []
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        pass
    # per-level split/pad to tile multiples, pack with the +1 neighbor
    off = 0
    for (Hl, Wl) in spatial_shapes:
        n = Hl * Wl
        seg = bits[:, off:off + n]                       # (B, n, H, D)
        nxt = jnp.concatenate(
            [seg[:, 1:], jnp.zeros_like(seg[:, :1])], 1)
        packed = (seg << 16) | nxt                       # (B, n, H, D)
        nt = _round_up(n, LANE)
        packed = jnp.pad(packed, ((0, 0), (0, nt - n), (0, 0), (0, 0)))
        parts.append(packed.reshape(B, nt // LANE, LANE, H, D))
        off += n
    tab = jnp.concatenate(parts, 1)                      # (B, T, LANE, H, D)
    tab = tab.transpose(0, 3, 1, 4, 2).reshape(
        B * H, T_total, D, LANE)
    return tab.astype(jnp.int32)


def _row_ids(base, wl, D):
    """Per-ROW (y-corner) in-tile lanes + tile ids: offsets {0, Wl}."""
    ids = []
    for off in (0, wl):
        tap = jnp.broadcast_to(base + off, (D, LANE))
        ids.append((tap & (LANE - 1), jax.lax.shift_right_logical(tap, 7)))
    return ids


def _unpack(acc):
    """packed int32 acc -> (f32 even-corner, f32 odd-corner), bit-exact
    bf16-as-f32."""
    hi = jax.lax.bitcast_convert_type(
        acc & jnp.int32(-65536), jnp.float32)
    lo = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(acc, 16), jnp.float32)
    return hi, lo


def _packed_fwd_kernel(wl_ref, tmin_ref, tmax_ref, base_ref, dx_ref,
                       dy_ref, at_ref, val_ref, out_ref, *, precision):
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
        tile = val_ref[0, t]                 # (D, LANE) int32 packed
        return [jnp.where(tt == t, jnp.take_along_axis(tile, lanec, axis=1),
                          a)
                for (lanec, tt), a in zip(ids, accs)]

    def epilogue(c, accs, ws):
        a00, a01 = _unpack(accs[0])
        a10, a11 = _unpack(accs[1])
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


def packed_forward(value, spatial_shapes, sampling_locations,
                   attention_weights):
    B, N, H, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(spatial_shapes)
    tile_base, T_total = _tile_bases(spatial_shapes)
    val = _packed_value_tables(value, spatial_shapes, T_total)
    val = jnp.pad(val, ((0, 0), (0, PROBE_PAD), (0, 0), (0, 0)))
    Tp = T_total + PROBE_PAD
    locs_p, attn_p, Qpad = _pad_queries(sampling_locations,
                                        attention_weights)
    NC = Qpad * P_POINTS // LANE
    base, dx, dy, at, tmin, tmax, wl = _prep_streams(
        spatial_shapes, locs_p, attn_p, tile_base)
    smem_w, smem, stream, table = _stream_specs(L, NC // CB, Tp, D)
    out = pl.pallas_call(
        functools.partial(_packed_fwd_kernel,
                          precision=_mxu_precision(value)),
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spread", type=float, default=1.0)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_msda import encoder_shapes, make_inputs

    shapes = encoder_shapes(800, 1344)
    value, loc, attn = make_inputs(shapes, B=3, spread=args.spread)
    value = value.astype(jnp.bfloat16)
    loc = loc.astype(jnp.float32)
    attn = attn.astype(jnp.float32)

    def bench(fn):
        @jax.jit
        def loop(v, l, a):
            def body(c, _):
                o = fn(v, l + c * 1e-7, a)
                return c + o[0, 0, 0].astype(l.dtype) * 0, None
            c, _ = jax.lax.scan(body, jnp.zeros((), l.dtype), None,
                                length=args.iters)
            return fn(v, l + c * 1e-7, a)
        out = loop(value, loc, attn)
        jax.block_until_ready(out)
        t0 = time.time()
        out = loop(value, loc, attn)
        jax.block_until_ready(out)
        return (time.time() - t0) / (args.iters + 1), np.asarray(
            out, np.float32)

    tb, ob = bench(lambda v, s_l, a: msda_cs.ms_deform_attn_cs(
        v, shapes, s_l, a))
    tp, op = bench(lambda v, s_l, a: packed_forward(v, shapes, s_l, a))
    print(f"cs shipped : {tb*1e3:8.2f} ms/call")
    print(f"packed-pair: {tp*1e3:8.2f} ms/call")
    err = np.abs(ob - op).max()
    rel = err / (np.abs(ob).max() + 1e-9)
    print(f"maxdiff {err:.3e} (rel {rel:.3e}) -> "
          f"{'EXACT' if rel < 1e-6 else 'CHECK'}")


if __name__ == "__main__":
    main()
