"""Round-4 parity-kernel ablation (b): merged chunk tile windows.

PERF_NOTES "parity-clip anatomy" named "merging chunks with identical
tile windows" as the remaining per-chunk fixed-work amortization.  This
measures its UPPER BOUND: a variant of the packed corner-stream forward
kernel whose static probe loop uses ONE shared block-level tile schedule
(t = min over the block's chunk tmins + k) with the tile loaded once per
probe and all CB chunks' select-chains run against it — i.e. the
perfectly-merged schedule.  Chunks whose window starts above the block
min lose taps, so the checksum drifts where windows differ; the TIMING
is the bound (the real merged kernel could only be slower: it still
needs per-chunk correctness fallbacks).

If this shows no speedup, merging is a dead end: consistent with the
round-2 ``noload`` ablation (tile loads ~free; the loop is issue-bound
on the per-chunk compare/lookup/select chains, which merging cannot
share because every chunk is a distinct 128-lane set).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_msda import encoder_shapes, make_inputs, bench
from pavenet_tpu.ops.pallas import msda_cs as CS
from pavenet_tpu.ops.pallas.msda import STATIC_PROBES, TAIL_PROBES


def _merged_kernel(wl_ref, tmin_ref, tmax_ref, base_ref, dx_ref, dy_ref,
                   at_ref, val_ref, out_ref, *, precision):
    """Packed forward with a SHARED static-probe schedule per block."""
    cblk = pl.program_id(1)
    l = pl.program_id(2)
    D = val_ref.shape[2]
    wl = wl_ref[l]
    CB, QPC, LANE = CS.CB, CS.QPC, CS.LANE

    @pl.when(l == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (QPC, LANE), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (QPC, LANE), 1)
    gt = (lanes // CS.P_POINTS == rows).astype(jnp.float32)

    parts = []
    tshared = tmin_ref[0, l, cblk, 0]
    for c in range(CB):
        base = base_ref[0, 0, 0, c]
        dx = dx_ref[0, 0, 0, c]
        dy = dy_ref[0, 0, 0, c]
        at = at_ref[0, 0, 0, c]
        parts.append((CS._row_ids(base, wl, D),
                      CS._corner_weights(dx, dy, at)))
        if c:
            tshared = jnp.minimum(tshared, tmin_ref[0, l, cblk, c])

    accs = [[jnp.zeros((D, LANE), jnp.int32)] * 2 for _ in range(CB)]
    for k in range(STATIC_PROBES):
        t = tshared + k
        tile = val_ref[0, t]                      # ONE load per probe
        for c in range(CB):
            ids, _ = parts[c]
            accs[c] = [jnp.where(tt == t,
                                 jnp.take_along_axis(tile, lanec, axis=1),
                                 a)
                       for (lanec, tt), a in zip(ids, accs[c])]
    for c in range(CB):
        _, ws = parts[c]
        a00, a01 = CS._unpack_pair(accs[c][0])
        a10, a11 = CS._unpack_pair(accs[c][1])
        acc = a00 * ws[0] + a01 * ws[1] + a10 * ws[2] + a11 * ws[3]
        part = jax.lax.dot_general(
            gt, acc, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        out_ref[0, c * QPC:(c + 1) * QPC, :] += part

    # tail identical to the shipped kernel (block-level groups)
    for g0 in range(0, CB, CS.TAIL_GROUP):
        group_overflow = jnp.zeros((), jnp.int32)
        for c in range(g0, g0 + CS.TAIL_GROUP):
            group_overflow = jnp.maximum(
                group_overflow,
                tmax_ref[0, l, cblk, c] - tmin_ref[0, l, cblk, c])

        @pl.when(group_overflow >= STATIC_PROBES)
        def _(g0=g0):
            for c in range(g0, g0 + CS.TAIL_GROUP):
                ids, ws = parts[c]
                tmin = tmin_ref[0, l, cblk, c]
                tmax = tmax_ref[0, l, cblk, c]
                acc2 = [jnp.zeros((D, LANE), jnp.int32)] * 2
                for j in range(TAIL_PROBES):
                    t = jnp.maximum(tmax - (TAIL_PROBES - 1) + j,
                                    tmin + STATIC_PROBES + j)
                    tile = val_ref[0, t]
                    acc2 = [jnp.where(tt == t,
                                      jnp.take_along_axis(tile, lanec,
                                                          axis=1), a)
                            for (lanec, tt), a in zip(ids, acc2)]
                a00, a01 = CS._unpack_pair(acc2[0])
                a10, a11 = CS._unpack_pair(acc2[1])
                acc = a00 * ws[0] + a01 * ws[1] + a10 * ws[2] + a11 * ws[3]
                part = jax.lax.dot_general(
                    gt, acc, dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32)
                out_ref[0, c * QPC:(c + 1) * QPC, :] += part


def main():
    shapes = encoder_shapes(800, 1344)
    for spread in (1.0, 4.0):
        value, loc, attn = make_inputs(shapes, B=3, spread=spread)
        value = value.astype(jnp.bfloat16)
        call = lambda v, l, a: CS.ms_deform_attn_cs(v, shapes, l, a)
        per, val = bench(call, value, loc, attn, 6)
        print(f"spread={spread} shipped: {per * 1e3:8.2f} ms/call "
              f"(chk {val:.6g})", flush=True)
        CS._msda_cs_kernel_packed = _merged_kernel
        try:
            per, val = bench(call, value, loc, attn, 6)
            print(f"spread={spread} merged:  {per * 1e3:8.2f} ms/call "
                  f"(chk {val:.6g}; checksum drift expected where "
                  f"windows differ)", flush=True)
        finally:
            CS._msda_cs_kernel_packed = _shipped


if __name__ == "__main__":
    _shipped = CS._msda_cs_kernel_packed
    main()
