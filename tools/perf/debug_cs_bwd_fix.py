"""Workaround hunt for the cs-native backward miscompile.

Round-2 quarantine (PERF_NOTES "corner-stream"): the dual-output backward
kernel's VMEM-resident ``gval`` table corrupts whenever the streamed
``vdot`` output is live downstream (tools' repro: gval exact alone, BAD
rel ~0.5 with all outputs consumed; the composed fwd+bwd program even
corrupts the forward).  This harness re-wires the pallas_call plumbing
without touching the kernel math:

  swap    outputs ordered (gval, vdot) instead of (vdot, gval)
  alias   gval accumulates into a zeros input via input_output_aliases
  pad     gval out_shape padded +8 tiles (breaks shape-equality with the
          val input — aliasing diagnostic)
  split   two pallas_calls: one emits vdot only, one emits gval only

Run on TPU: python tools/perf/debug_cs_bwd_fix.py [--variant X] [--bench]
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

from pavenet_tpu.ops.ms_deform_attn import ms_deform_attn_xla
from pavenet_tpu.ops.pallas.msda import (
    _tile_bases, _value_tables, _pad_queries, PROBE_PAD, _mxu_precision)
from pavenet_tpu.ops.pallas import msda_cs
from pavenet_tpu.ops.pallas.msda_cs import (
    LANE, P_POINTS, QPC, CB, _prep_streams, _stream_specs, _stream_weights,
    _msda_cs_bwd_kernel)


def _vdot_only_kernel(wl_ref, tmin_ref, tmax_ref, base_ref, dx_ref, dy_ref,
                      at_ref, val_ref, g_ref, vdot_ref, *, precision):
    """The bwd kernel minus the gval table (single streamed output)."""
    import jax.lax as lax
    cblk = pl.program_id(1)
    l = pl.program_id(2)
    D = val_ref.shape[2]
    wl = wl_ref[l]
    from pavenet_tpu.ops.pallas.msda_cs import (_corner_ids,
                                                _corner_weights,
                                                STATIC_PROBES, TAIL_PROBES,
                                                TAIL_GROUP)

    rows = lax.broadcasted_iota(jnp.int32, (QPC, LANE), 0)
    lanes = lax.broadcasted_iota(jnp.int32, (QPC, LANE), 1)
    gt = (lanes // P_POINTS == rows).astype(jnp.float32)

    def chunk_parts(c):
        base = base_ref[0, 0, 0, c]
        dx = dx_ref[0, 0, 0, c]
        dy = dy_ref[0, 0, 0, c]
        at = at_ref[0, 0, 0, c]
        ids = _corner_ids(base, wl, D)
        ws = _corner_weights(dx, dy, at)
        g8 = g_ref[0, c * QPC:(c + 1) * QPC, :]
        R = lax.dot_general(
            g8, gt, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        return ids, ws, R

    def probe(t, ids, gvaccs):
        tile = val_ref[0, t]
        return [jnp.where(tt == t,
                          jnp.take_along_axis(tile, lanec, axis=1), gv)
                for (lanec, tt), gv in zip(ids, gvaccs)]

    def flush(c, gvaccs, R, acc=False):
        for j, gv in enumerate(gvaccs):
            vd = jnp.sum(gv * R, axis=0, keepdims=True)
            if acc:
                vdot_ref[0, 0, 0, c * 4 + j] += vd
            else:
                vdot_ref[0, 0, 0, c * 4 + j] = vd

    for c in range(CB):
        ids, ws, R = chunk_parts(c)
        tmin = tmin_ref[0, l, cblk, c]
        gvaccs = [jnp.zeros((D, LANE), jnp.float32)] * 4
        for k in range(STATIC_PROBES):
            gvaccs = probe(tmin + k, ids, gvaccs)
        flush(c, gvaccs, R)

    for g0 in range(0, CB, TAIL_GROUP):
        group_overflow = jnp.zeros((), jnp.int32)
        for c in range(g0, g0 + TAIL_GROUP):
            group_overflow = jnp.maximum(
                group_overflow,
                tmax_ref[0, l, cblk, c] - tmin_ref[0, l, cblk, c])

        @pl.when(group_overflow >= STATIC_PROBES)
        def _(g0=g0):
            for c in range(g0, g0 + TAIL_GROUP):
                ids, ws, R = chunk_parts(c)
                tmin = tmin_ref[0, l, cblk, c]
                tmax = tmax_ref[0, l, cblk, c]
                gvaccs = [jnp.zeros((D, LANE), jnp.float32)] * 4
                for j in range(TAIL_PROBES):
                    t = jnp.maximum(tmax - (TAIL_PROBES - 1) + j,
                                    tmin + STATIC_PROBES + j)
                    gvaccs = probe(t, ids, gvaccs)
                flush(c, gvaccs, R, acc=True)

        @pl.when(group_overflow >= STATIC_PROBES + TAIL_PROBES)
        def _(g0=g0):
            for c in range(g0, g0 + TAIL_GROUP):
                ids, ws, R = chunk_parts(c)
                tmin = tmin_ref[0, l, cblk, c]
                tmax = tmax_ref[0, l, cblk, c]
                gvaccs = jax.lax.fori_loop(
                    tmin + STATIC_PROBES, tmax - TAIL_PROBES + 1,
                    lambda t, gv: tuple(probe(t, ids, list(gv))),
                    (jnp.zeros((D, LANE), jnp.float32),) * 4)
                flush(c, list(gvaccs), R, acc=True)


def _gval_only_kernel(wl_ref, tmin_ref, tmax_ref, base_ref, dx_ref, dy_ref,
                      at_ref, val_ref, g_ref, gval_ref, *, precision):
    """The bwd kernel minus vdot (single resident-table output)."""
    import jax.lax as lax
    cblk = pl.program_id(1)
    l = pl.program_id(2)
    D = val_ref.shape[2]
    wl = wl_ref[l]
    from pavenet_tpu.ops.pallas.msda_cs import (_corner_ids,
                                                _corner_weights,
                                                STATIC_PROBES, TAIL_PROBES,
                                                TAIL_GROUP)

    @pl.when((pl.program_id(1) == 0) & (l == 0))
    def _():
        gval_ref[...] = jnp.zeros_like(gval_ref)

    rows = lax.broadcasted_iota(jnp.int32, (QPC, LANE), 0)
    lanes = lax.broadcasted_iota(jnp.int32, (QPC, LANE), 1)
    gt = (lanes // P_POINTS == rows).astype(jnp.float32)
    lane_j = lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)

    def chunk_parts(c):
        base = base_ref[0, 0, 0, c]
        dx = dx_ref[0, 0, 0, c]
        dy = dy_ref[0, 0, 0, c]
        at = at_ref[0, 0, 0, c]
        ids = _corner_ids(base, wl, D)
        ws = _corner_weights(dx, dy, at)
        g8 = g_ref[0, c * QPC:(c + 1) * QPC, :]
        R = lax.dot_general(
            g8, gt, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        ohs = [(lanec[0:1] == lane_j) for (lanec, _) in ids]
        Rws = [R * w for w in ws]
        return ids, ohs, Rws

    def probe(t, ids, ohs, Rws):
        contrib = None
        for (lanec, tt), ohl, Rw in zip(ids, ohs, Rws):
            hit = tt == t
            oh = (ohl & hit[0:1]).astype(jnp.float32)
            part = lax.dot_general(
                Rw, oh, dimension_numbers=(((1,), (1,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32)
            contrib = part if contrib is None else contrib + part
        gval_ref[0, t] += contrib

    for c in range(CB):
        ids, ohs, Rws = chunk_parts(c)
        tmin = tmin_ref[0, l, cblk, c]
        for k in range(STATIC_PROBES):
            probe(tmin + k, ids, ohs, Rws)

    for g0 in range(0, CB, TAIL_GROUP):
        group_overflow = jnp.zeros((), jnp.int32)
        for c in range(g0, g0 + TAIL_GROUP):
            group_overflow = jnp.maximum(
                group_overflow,
                tmax_ref[0, l, cblk, c] - tmin_ref[0, l, cblk, c])

        @pl.when(group_overflow >= STATIC_PROBES)
        def _(g0=g0):
            for c in range(g0, g0 + TAIL_GROUP):
                ids, ohs, Rws = chunk_parts(c)
                tmin = tmin_ref[0, l, cblk, c]
                tmax = tmax_ref[0, l, cblk, c]
                for j in range(TAIL_PROBES):
                    t = jnp.maximum(tmax - (TAIL_PROBES - 1) + j,
                                    tmin + STATIC_PROBES + j)
                    probe(t, ids, ohs, Rws)

        @pl.when(group_overflow >= STATIC_PROBES + TAIL_PROBES)
        def _(g0=g0):
            for c in range(g0, g0 + TAIL_GROUP):
                ids, ohs, Rws = chunk_parts(c)
                tmin = tmin_ref[0, l, cblk, c]
                tmax = tmax_ref[0, l, cblk, c]
                jax.lax.fori_loop(
                    tmin + STATIC_PROBES, tmax - TAIL_PROBES + 1,
                    lambda t, x: (probe(t, ids, ohs, Rws), x)[1], 0)


def backward_variant(variant, value, spatial_shapes, sampling_locations,
                     attention_weights, g):
    B, N, H, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(spatial_shapes)

    tile_base, T_total = _tile_bases(spatial_shapes)
    val = _value_tables(value, spatial_shapes, T_total)
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
    gspec = pl.BlockSpec((1, QPC * CB, D), lambda bh, c, l: (bh, c, 0),
                         memory_space=pltpu.VMEM)
    vdot_spec = pl.BlockSpec((1, 1, 1, CB * 4, 1, LANE),
                             lambda bh, c, l: (bh, l, c, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    vdot_shape = jax.ShapeDtypeStruct((B * H, L, NC // CB, CB * 4, 1, LANE),
                                      jnp.float32)
    gval_shape = jax.ShapeDtypeStruct((B * H, Tp, D, LANE), jnp.float32)
    prec = _mxu_precision(value)

    if variant == "swap":
        gval, vdot = pl.pallas_call(
            functools.partial(_swapped_kernel, precision=prec),
            grid=(B * H, NC // CB, L),
            in_specs=[smem_w, smem, smem, stream, stream, stream, stream,
                      table, gspec],
            out_specs=(table, vdot_spec),
            out_shape=(gval_shape, vdot_shape),
        )(wl, tmin, tmax, base, dx, dy, at, val, g_bh)
    elif variant == "alias":
        gval0 = jnp.zeros((B * H, Tp, D, LANE), jnp.float32)
        vdot, gval = pl.pallas_call(
            functools.partial(_noinit_kernel, precision=prec),
            grid=(B * H, NC // CB, L),
            in_specs=[smem_w, smem, smem, stream, stream, stream, stream,
                      table, gspec, table],
            out_specs=(vdot_spec, table),
            out_shape=(vdot_shape, gval_shape),
            input_output_aliases={9: 1},
        )(wl, tmin, tmax, base, dx, dy, at, val, g_bh, gval0)
    elif variant == "pad":
        PADT = 8
        table_p = pl.BlockSpec((1, Tp + PADT, D, LANE),
                               lambda bh, c, l: (bh, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        vdot, gval = pl.pallas_call(
            functools.partial(_msda_cs_bwd_kernel, precision=prec),
            grid=(B * H, NC // CB, L),
            in_specs=[smem_w, smem, smem, stream, stream, stream, stream,
                      table, gspec],
            out_specs=(vdot_spec, table_p),
            out_shape=(vdot_shape,
                       jax.ShapeDtypeStruct((B * H, Tp + PADT, D, LANE),
                                            jnp.float32)),
        )(wl, tmin, tmax, base, dx, dy, at, val, g_bh)
        gval = gval[:, :Tp]
    elif variant == "split":
        vdot = pl.pallas_call(
            functools.partial(_vdot_only_kernel, precision=prec),
            grid=(B * H, NC // CB, L),
            in_specs=[smem_w, smem, smem, stream, stream, stream, stream,
                      table, gspec],
            out_specs=vdot_spec,
            out_shape=vdot_shape,
        )(wl, tmin, tmax, base, dx, dy, at, val, g_bh)
        gval = pl.pallas_call(
            functools.partial(_gval_only_kernel, precision=prec),
            grid=(B * H, NC // CB, L),
            in_specs=[smem_w, smem, smem, stream, stream, stream, stream,
                      table, gspec],
            out_specs=table,
            out_shape=gval_shape,
        )(wl, tmin, tmax, base, dx, dy, at, val, g_bh)
    else:  # "base": current quarantined wiring
        vdot, gval = pl.pallas_call(
            functools.partial(_msda_cs_bwd_kernel, precision=prec),
            grid=(B * H, NC // CB, L),
            in_specs=[smem_w, smem, smem, stream, stream, stream, stream,
                      table, gspec],
            out_specs=(vdot_spec, table),
            out_shape=(vdot_shape, gval_shape),
        )(wl, tmin, tmax, base, dx, dy, at, val, g_bh)

    gval = gval[:, :T_total]
    gval = gval.reshape(B, H, T_total, D, LANE)
    parts = []
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        n = Hl * Wl
        nt = -(-n // LANE)
        v = gval[:, :, tile_base[lvl]:tile_base[lvl] + nt]
        v = v.transpose(0, 1, 3, 2, 4).reshape(B, H, D, nt * LANE)[..., :n]
        parts.append(v)
    g_val = jnp.concatenate(parts, -1).transpose(0, 3, 1, 2).astype(
        value.dtype)

    def wfun(lo, at_):
        ws, _ = _stream_weights(spatial_shapes, lo, at_)
        return tuple(w for lvl_ws in ws for w in lvl_ws)

    _, vjp_w = jax.vjp(wfun, locs_p, attn_p)
    vd = vdot.reshape(B, H, L, -1, 4, LANE)
    cts = []
    for lvl in range(L):
        for corner in range(4):
            c = vd[:, :, lvl, :, corner, :].reshape(B, H, Qpad, P_POINTS)
            cts.append(c.transpose(0, 2, 1, 3))
    g_loc_p, g_attn_p = vjp_w(tuple(cts))
    return (g_val, g_loc_p[:, :Q].astype(sampling_locations.dtype),
            g_attn_p[:, :Q].astype(attention_weights.dtype))


def _swapped_kernel(wl_ref, tmin_ref, tmax_ref, base_ref, dx_ref, dy_ref,
                    at_ref, val_ref, g_ref, gval_ref, vdot_ref, *,
                    precision):
    _msda_cs_bwd_kernel(wl_ref, tmin_ref, tmax_ref, base_ref, dx_ref,
                        dy_ref, at_ref, val_ref, g_ref, vdot_ref, gval_ref,
                        precision=precision)


def _noinit_kernel(wl_ref, tmin_ref, tmax_ref, base_ref, dx_ref, dy_ref,
                   at_ref, val_ref, g_ref, gval0_ref, vdot_ref, gval_ref,
                   *, precision):
    # aliased zero input supplies the init; skip the pl.when zero-fill by
    # monkey-level reuse: the shared kernel's init writes zeros anyway,
    # which is idempotent with the aliased zeros input
    _msda_cs_bwd_kernel(wl_ref, tmin_ref, tmax_ref, base_ref, dx_ref,
                        dy_ref, at_ref, val_ref, g_ref, vdot_ref, gval_ref,
                        precision=precision)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="+",
                    default=["base", "swap", "alias", "pad", "split"])
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    SH = ((24, 32), (12, 16), (6, 8))
    B, Q, H, D, P = 1, 800, 2, 32, 4
    L = len(SH)
    N = sum(h * w for h, w in SH)
    value = jnp.asarray(rng.randn(B, N, H, D).astype(np.float32))
    base = rng.rand(B, Q, H, 1, 1, 2)
    loc = jnp.asarray((base + rng.randn(B, Q, H, L, P, 2) * 0.05)
                      .astype(np.float32))
    attn = rng.rand(B, Q, H, L, P).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)
    attn = jnp.asarray(attn)
    g = jnp.asarray(rng.randn(B, Q, H * D).astype(np.float32))

    @jax.jit
    def oracle(v, l, a, gg):
        _, vjp = jax.vjp(lambda v_, l_, a_: ms_deform_attn_xla(
            v_, SH, l_, a_), v, l, a)
        return vjp(gg)

    gv_o, gl_o, ga_o = [np.asarray(x) for x in oracle(value, loc, attn, g)]

    for variant in args.variants:
        t0 = time.time()
        f = jax.jit(functools.partial(backward_variant, variant),
                    static_argnums=(1,))
        out = [np.asarray(x) for x in f(value, SH, loc, attn, g)]
        dt = time.time() - t0
        oks = []
        for tag, got, want in (("gval", out[0], gv_o),
                               ("gloc", out[1], gl_o),
                               ("gattn", out[2], ga_o)):
            rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
            oks.append(rel < 1e-4)
            print(f"{variant:6s} {tag}: rel {rel:.3e} "
                  f"{'OK' if rel < 1e-4 else 'BAD'}", flush=True)
        print(f"{variant:6s} compile+run {dt:.0f}s "
              f"{'ALL OK' if all(oks) else 'CORRUPt'}", flush=True)


if __name__ == "__main__" and "--diagnose" not in sys.argv:
    main()


def diagnose():
    """Localize the corruption + optimization_barrier experiment."""
    rng = np.random.RandomState(0)
    SH = ((24, 32), (12, 16), (6, 8))
    B, Q, H, D, P = 1, 800, 2, 32, 4
    L = len(SH)
    N = sum(h * w for h, w in SH)
    value = jnp.asarray(rng.randn(B, N, H, D).astype(np.float32))
    base = rng.rand(B, Q, H, 1, 1, 2)
    loc = jnp.asarray((base + rng.randn(B, Q, H, L, P, 2) * 0.05)
                      .astype(np.float32))
    attn = rng.rand(B, Q, H, L, P).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)
    attn = jnp.asarray(attn)
    g = jnp.asarray(rng.randn(B, Q, H * D).astype(np.float32))

    @jax.jit
    def oracle(v, l, a, gg):
        _, vjp = jax.vjp(lambda v_, l_, a_: ms_deform_attn_xla(
            v_, SH, l_, a_), v, l, a)
        return vjp(gg)

    gv_o = np.asarray(oracle(value, loc, attn, g)[0])

    # barrier variant: cut every kernel input out of the shared prep
    def backward_barrier(value, spatial_shapes, sampling_locations,
                         attention_weights, g):
        B, N, H, D = value.shape
        Q = sampling_locations.shape[1]
        L = len(spatial_shapes)
        tile_base, T_total = _tile_bases(spatial_shapes)
        val = _value_tables(value, spatial_shapes, T_total)
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
        # BARRIER: force materialization, block CSE/fusion across this cut
        (base, dx, dy, at, tmin, tmax, wl, val, g_bh) = \
            jax.lax.optimization_barrier(
                (base, dx, dy, at, tmin, tmax, wl, val, g_bh))
        smem_w, smem, stream, table = _stream_specs(L, NC // CB, Tp, D)
        gspec = pl.BlockSpec((1, QPC * CB, D), lambda bh, c, l: (bh, c, 0),
                             memory_space=pltpu.VMEM)
        vdot_spec = pl.BlockSpec((1, 1, 1, CB * 4, 1, LANE),
                                 lambda bh, c, l: (bh, l, c, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        vdot, gval = pl.pallas_call(
            functools.partial(_msda_cs_bwd_kernel,
                              precision=_mxu_precision(value)),
            grid=(B * H, NC // CB, L),
            in_specs=[smem_w, smem, smem, stream, stream, stream, stream,
                      table, gspec],
            out_specs=(vdot_spec, table),
            out_shape=(jax.ShapeDtypeStruct(
                           (B * H, L, NC // CB, CB * 4, 1, LANE),
                           jnp.float32),
                       jax.ShapeDtypeStruct((B * H, Tp, D, LANE),
                                            jnp.float32)),
        )(wl, tmin, tmax, base, dx, dy, at, val, g_bh)
        gval = gval[:, :T_total].reshape(B, H, T_total, D, LANE)
        parts = []
        for lvl, (Hl, Wl) in enumerate(spatial_shapes):
            n = Hl * Wl
            nt = -(-n // LANE)
            v = gval[:, :, tile_base[lvl]:tile_base[lvl] + nt]
            v = v.transpose(0, 1, 3, 2, 4).reshape(
                B, H, D, nt * LANE)[..., :n]
            parts.append(v)
        g_val = jnp.concatenate(parts, -1).transpose(0, 3, 1, 2)

        def wfun(lo, at_):
            ws, _ = _stream_weights(spatial_shapes, lo, at_)
            return tuple(w for lvl_ws in ws for w in lvl_ws)

        _, vjp_w = jax.vjp(wfun, locs_p, attn_p)
        vd = vdot.reshape(B, H, L, -1, 4, LANE)
        cts = []
        for lvl in range(L):
            for corner in range(4):
                c = vd[:, :, lvl, :, corner, :].reshape(
                    B, H, Qpad, P_POINTS)
                cts.append(c.transpose(0, 2, 1, 3))
        g_loc_p, g_attn_p = vjp_w(tuple(cts))
        return g_val, g_loc_p[:, :Q], g_attn_p[:, :Q]

    f = jax.jit(backward_barrier, static_argnums=(1,))
    out = [np.asarray(x) for x in f(value, SH, loc, attn, g)]
    rel = np.abs(out[0] - gv_o).max() / np.abs(gv_o).max()
    print(f"barrier gval rel {rel:.3e} {'OK' if rel < 1e-4 else 'BAD'}",
          flush=True)

    # localize errors per level in the base variant
    fb = jax.jit(functools.partial(backward_variant, "base"),
                 static_argnums=(1,))
    gv_b = np.asarray(fb(value, SH, loc, attn, g)[0])
    off = 0
    for lvl, (Hl, Wl) in enumerate(SH):
        n = Hl * Wl
        e = np.abs(gv_b[:, off:off + n] - gv_o[:, off:off + n]).max()
        print(f"  level {lvl} ({Hl}x{Wl}): maxerr {e:.3e}", flush=True)
        off += n


if __name__ == "__main__" and "--diagnose" in sys.argv:
    sys.argv.remove("--diagnose")
    diagnose()
    sys.exit(0)
