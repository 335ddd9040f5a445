"""Pallas TPU kernel for multi-scale deformable attention sampling.

Motivation (measured on v5e): XLA's gather costs ~23ns per index regardless
of payload or locality — the encoder's deformable attention needs ~8.6M
block indices per call (~200+ms), making the reference-equivalent encoder
gather-bound.  This kernel instead uses Mosaic's *within-tile lane lookup*
(``take_along_axis`` on a 128-lane tile), which moves 128 taps x D channels
per vector op:

- values are laid out channel-major as ``(BH, tiles, D, 128)`` — token ``i``
  of a level lives at tile ``base_l + i // 128``, lane ``i % 128``;
- the 4 bilinear corner taps of every sampling point are precomputed in XLA
  as flat (global-tile-space) indices + folded weights
  (bilinear x validity x attention), in (query, point, corner) order, so a
  128-lane chunk is exactly 8 queries x 16 corner-taps of one level;
- per chunk, a ``fori_loop`` sweeps the chunk's [min,max] tile span doing
  one lane-lookup per tile with hit-masking — taps are spatially local in
  the encoder so spans are small; correctness never depends on locality;
- per-query sums come from exact lane roll-adds (no MXU rounding); 16
  chunks' results pack into one 128-query register tile that flushes to a
  channel-major ``(BH, D, Q)`` output at 128-lane alignment.

The backward is a fused Pallas kernel in the same layout (counterpart of the
reference col2im backward, ``ms_deform_attn_cuda.cu:48-205``): per 128-tap
chunk it re-gathers the forward taps (per-tap ``v_dot = <g_q, V[tap]>``) and
scatters ``folded_weight * g_q`` rows into a VMEM-resident channel-major
``grad_value`` table via an exact one-hot MXU contraction per probe tile —
no atomics, no giant gathered-tap residuals.  Grads w.r.t. locations and
attention weights then fall out of an elementwise ``jax.vjp`` through the
tap-weight folding (``_prep_taps``) contracted with ``v_dot``: since the tap
*indices* are piecewise-constant in the locations (zero derivative a.e.),
``d out / d loc == d(folded_w)/d loc · v_dot`` exactly, matching AD of the
XLA formulation.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TAPS_PER_POINT = 4
GROUP = 16          # taps per query per level (P * corners)
QPC = LANE // GROUP  # queries per 128-lane chunk
PACK = LANE // QPC   # chunks packed into one 128-query output tile


def _mxu_precision(value):
    """MXU precision for the in-kernel one-hot contractions, derived from
    the op's input dtype: bf16 models get the single-pass bf16 MXU
    (DEFAULT) — one extra rounding inside the op, below the model's own
    activation quantization floor — while f32 inputs (all parity/exactness
    gates) keep the exact 6-pass f32 contraction (HIGHEST; Mosaic does not
    lower HIGH).  Measured v5e: the backward runs one contraction per
    (chunk, probe), so it gains most."""
    return (jax.lax.Precision.DEFAULT
            if value.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _prep_taps(spatial_shapes, locations, weights, tile_base):
    """Corner-tap indices (global tile space) + folded weights.

    locations (B, Q, H, L, P, 2), weights (B, Q, H, L, P) ->
    idx (B, H, L, Q*P*4) int32, w (B, H, L, Q*P*4) f32, (q, p, corner) order.
    """
    B, Q, H, L, P, _ = locations.shape
    idx_all, w_all = [], []
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        loc = locations[:, :, :, lvl].astype(jnp.float32)
        x = loc[..., 0] * Wl - 0.5
        y = loc[..., 1] * Hl - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        ys = jnp.clip(y0, 0, max(Hl - 2, 0))
        xs = jnp.clip(x0, 0, max(Wl - 2, 0))
        wy0 = jnp.maximum(1.0 - jnp.abs(y - ys), 0.0)
        wy1 = jnp.maximum(1.0 - jnp.abs(y - (ys + 1)), 0.0)
        wx0 = jnp.maximum(1.0 - jnp.abs(x - xs), 0.0)
        wx1 = jnp.maximum(1.0 - jnp.abs(x - (xs + 1)), 0.0)
        attn = weights[:, :, :, lvl].astype(jnp.float32)
        base = ys * Wl + xs + tile_base[lvl] * LANE
        idx = jnp.stack([base, base + 1, base + Wl, base + Wl + 1], -1)
        w = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1],
                      -1) * attn[..., None]
        idx_all.append(idx.transpose(0, 2, 1, 3, 4).reshape(B, H, -1))
        w_all.append(w.transpose(0, 2, 1, 3, 4).reshape(B, H, -1))
    return (jnp.stack(idx_all, 2), jnp.stack(w_all, 2))


STATIC_PROBES = 4  # encoder tap spans are almost always <= 4 tiles
TAIL_PROBES = 4    # top-anchored branchless tail probes (span <= 8 total)
PROBE_PAD = STATIC_PROBES + TAIL_PROBES - 1  # zero tiles appended to tables
TAIL_GROUP = 32    # chunks per tail branch; == CB (block-level) measured
                   # best in-model: finer groups (8) save redo work but the
                   # extra per-group branch tests cost more (423 vs 415 ms
                   # full clip)


def _msda_kernel(tmin_ref, tmax_ref, idx_ref, w_ref, val_ref, out_ref,
                 *, precision):
    """Grid (BH, NC//CB, L); levels fastest so each chunk-block's output
    accumulates over levels while resident.

    Per-chunk tile windows come precomputed in SMEM (``tmin_ref``:
    (1, L, NCB, CB) min tile per chunk; ``tmax_ref``: same for the max
    tile — the per-*block* overflow test reduces their difference
    in-kernel once per grid step).  Probes are UNCLAMPED over a value table padded
    with STATIC_PROBES-1 zero tiles, so each probe tile is distinct and
    the lane-range check alone is exact — no per-probe scalar guard.

    The span > STATIC_PROBES tail is hoisted to TWO ``pl.when`` branches
    per grid step (measured on v5e, a per-chunk ``lax.cond``+zero-trip
    ``fori_loop`` cost ~55ms of a 152ms encoder-scale call even when the
    tail never ran): a branchless TAIL_PROBES top-anchored probe set
    covering spans <= STATIC+TAIL, and a fori_loop over the remaining
    middle for adversarial spans only — see the comment at the tail.
    """
    cblk = pl.program_id(1)
    l = pl.program_id(2)
    D = val_ref.shape[2]
    CB = idx_ref.shape[3]

    @pl.when(l == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (QPC, LANE), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (QPC, LANE), 1)
    gt = (lanes // GROUP == rows).astype(jnp.float32)

    for c in range(CB):
        taps = idx_ref[0, 0, 0, c]                  # (1, LANE) int32
        w = w_ref[0, 0, 0, c]                       # (1, LANE) f32
        # Each tap lives in exactly ONE tile, so the probe loop can
        # *select* instead of mask-and-add: precompute the in-tile lane
        # (taps & 127) and the global tile id (taps >> 7) once per chunk,
        # then each probe is compare + lookup + select — 3 vector ops vs
        # the 9 of the sub/2-cmp/and/clip/lookup/select/add form (the
        # main loop is instruction-issue-bound, see PERF_NOTES).
        taps_b = jnp.broadcast_to(taps, (D, LANE))
        lanec = taps_b & (LANE - 1)
        tt = jax.lax.shift_right_logical(taps_b, 7)
        tmin = tmin_ref[0, l, cblk, c]

        acc = jnp.zeros((D, LANE), jnp.float32)
        for k in range(STATIC_PROBES):
            t = tmin + k
            tile = val_ref[0, t]                    # (D, LANE)
            g = jnp.take_along_axis(tile, lanec, axis=1)
            acc = jnp.where(tt == t, g, acc)
        acc = acc * w
        # 16-lane group sums + implicit transpose in one dtype-precision
        # MXU contraction: (G, LANE) one-hot x (D, LANE) -> (G, D)
        part = jax.lax.dot_general(
            gt, acc, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)
        out_ref[0, c * QPC:(c + 1) * QPC, :] += part

    # two-level exact tail for long spans, branched per GROUP of chunks.
    # Level 1 (span > STATIC_PROBES): TAIL_PROBES *top-anchored* probes
    # t_j = max(tmax - (TAIL_PROBES-1) + j, tmin + STATIC_PROBES + j) —
    # strictly ascending, disjoint from the static window, and together
    # they cover every span <= STATIC_PROBES + TAIL_PROBES with NO
    # fori_loop (a per-chunk loop costs ~350 cycles/iter on the scalar
    # core; encoder chunks whose queries live on a coarser level than the
    # sampled one overflow *structurally* at row wraps, so this branch is
    # warm in practice).  Branching per TAIL_GROUP-chunk group rather than
    # per 32-chunk block keeps the warm branch from redoing chunks whose
    # spans fit the static window (overflowing chunks cluster at row
    # wraps).  Probes past tmax land on later real tiles or the PROBE_PAD
    # zero tiles: no tap maps there, the lane-range check alone keeps
    # them exact.  Level 2 (span > STATIC+TAIL): fori over the remaining
    # middle [tmin+STATIC, tmax-TAIL] — adversarial inputs only.
    for g0 in range(0, CB, TAIL_GROUP):
        group_overflow = jnp.zeros((), jnp.int32)
        for c in range(g0, g0 + TAIL_GROUP):
            group_overflow = jnp.maximum(
                group_overflow,
                tmax_ref[0, l, cblk, c] - tmin_ref[0, l, cblk, c])

        @pl.when(group_overflow >= STATIC_PROBES)
        def _(g0=g0):
            for c in range(g0, g0 + TAIL_GROUP):
                taps = idx_ref[0, 0, 0, c]
                w = w_ref[0, 0, 0, c]
                taps_b = jnp.broadcast_to(taps, (D, LANE))
                lanec = taps_b & (LANE - 1)
                tt = jax.lax.shift_right_logical(taps_b, 7)
                tmin = tmin_ref[0, l, cblk, c]
                tmax = tmax_ref[0, l, cblk, c]

                acc = jnp.zeros((D, LANE), jnp.float32)
                for j in range(TAIL_PROBES):
                    t = jnp.maximum(tmax - (TAIL_PROBES - 1) + j,
                                    tmin + STATIC_PROBES + j)
                    tile = val_ref[0, t]
                    g = jnp.take_along_axis(tile, lanec, axis=1)
                    acc = jnp.where(tt == t, g, acc)
                part = jax.lax.dot_general(
                    gt, acc * w, dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32)
                out_ref[0, c * QPC:(c + 1) * QPC, :] += part

        @pl.when(group_overflow >= STATIC_PROBES + TAIL_PROBES)
        def _(g0=g0):
            for c in range(g0, g0 + TAIL_GROUP):
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
                    tmin + STATIC_PROBES, tmax - TAIL_PROBES + 1, tile_body,
                    jnp.zeros((D, LANE), jnp.float32))
                part = jax.lax.dot_general(
                    gt, extra * w,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32)
                out_ref[0, c * QPC:(c + 1) * QPC, :] += part


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations,
                          attention_weights):
    """Same contract as ``ms_deform_attn_xla``; TPU Pallas forward."""
    return _forward(value, spatial_shapes, sampling_locations,
                    attention_weights)


CB = 32  # chunks per grid step


def _tile_bases(spatial_shapes):
    """Per-level tile offsets; each level starts at a tile boundary."""
    tile_base = []
    t = 0
    for (Hl, Wl) in spatial_shapes:
        tile_base.append(t)
        t += _round_up(Hl * Wl, LANE) // LANE
    return tile_base, t


def _value_tables(value, spatial_shapes, T_total):
    """Pack (B, N, H, D) values into channel-major (BH, T, D, LANE) tables.

    f32: Mosaic's lane lookup does not compile for bf16 tiles."""
    B, N, H, D = value.shape
    vt = []
    start = 0
    for (Hl, Wl) in spatial_shapes:
        n = Hl * Wl
        v = jax.lax.slice_in_dim(value, start, start + n, axis=1)
        v = v.transpose(0, 2, 3, 1)
        pad = _round_up(n, LANE) - n
        v = jnp.pad(v, ((0, 0),) * 3 + ((0, pad),))
        vt.append(v.reshape(B, H, D, -1, LANE).transpose(0, 1, 3, 2, 4))
        start += n
    return jnp.concatenate(vt, 2).reshape(
        B * H, T_total, D, LANE).astype(jnp.float32)


def _pad_queries(sampling_locations, attention_weights):
    """Pad the query axis so chunks fill CB-sized grid steps.

    Padded locations replicate the edge query (gradient-safe: their
    attention weights are zero-padded, so every padded-tap weight — and
    with it d/d loc — is exactly 0)."""
    Q = sampling_locations.shape[1]
    Qpad = _round_up(Q, QPC * CB)
    if Qpad != Q:
        padq = Qpad - Q
        sampling_locations = jnp.pad(
            sampling_locations, ((0, 0), (0, padq)) + ((0, 0),) * 4,
            mode="edge")
        attention_weights = jnp.pad(
            attention_weights, ((0, 0), (0, padq)) + ((0, 0),) * 3)
    return sampling_locations, attention_weights, Qpad


def _tile_windows(idx):
    """Per-chunk [min, max] tile windows, computed in XLA and fed to the
    kernels through SMEM (replaces per-chunk in-kernel reductions)."""
    tmin = (jnp.min(idx, axis=(-2, -1)) // LANE).astype(jnp.int32)
    tmax = (jnp.max(idx, axis=(-2, -1)) // LANE).astype(jnp.int32)
    return tmin, tmax  # (BH, L, NCB, CB) each


def _chunk_windows(spatial_shapes, locations, tile_base):
    """Per-chunk [min, max] tile windows from locations in NATIVE layout.

    Equal to ``_tile_windows(idx)`` but never touches the transposed tap
    stream: a chunk's 128 taps are 8 queries x 4 points x 4 corners whose
    min index is the corner-0 base and max is base + Wl + 1, so the
    reduce runs over (QPC, P) groups of the (B, Q, H, P) base array and
    only the tiny (B, L, NC, H) result gets transposed.  Measured: the
    old reduce's fusion re-ran the whole 274 MB tap build (39 ms of a
    46 ms encoder-scale prep, `tools/perf/prep_split.py`)."""
    B, Q, H, L, P, _ = locations.shape
    tmins, tmaxs = [], []
    for lvl, (Hl, Wl) in enumerate(spatial_shapes):
        loc = locations[:, :, :, lvl].astype(jnp.float32)
        x = loc[..., 0] * Wl - 0.5
        y = loc[..., 1] * Hl - 0.5
        xs = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, max(Wl - 2, 0))
        ys = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, max(Hl - 2, 0))
        base = (ys * Wl + xs + tile_base[lvl] * LANE).reshape(
            B, Q // QPC, QPC, H, P)
        tmins.append(jnp.min(base, axis=(2, 4)) // LANE)     # (B, NC, H)
        tmaxs.append((jnp.max(base, axis=(2, 4)) + Wl + 1) // LANE)
    tmin = jnp.stack(tmins, 1)  # (B, L, NC, H)
    tmax = jnp.stack(tmaxs, 1)
    shape = (B * H, L, -1, CB)
    return (tmin.transpose(0, 3, 1, 2).reshape(shape).astype(jnp.int32),
            tmax.transpose(0, 3, 1, 2).reshape(shape).astype(jnp.int32))


def _forward(value, spatial_shapes, sampling_locations, attention_weights):
    B, N, H, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(spatial_shapes)
    P = sampling_locations.shape[4]
    assert P * TAPS_PER_POINT == GROUP, (
        f"P={P}: kernel currently assumes P*4 == {GROUP} taps per query")

    tile_base, T_total = _tile_bases(spatial_shapes)
    val = _value_tables(value, spatial_shapes, T_total)
    # zero tiles so the static + tail probes never need clamping
    val = jnp.pad(val, ((0, 0), (0, PROBE_PAD), (0, 0), (0, 0)))
    Tp = T_total + PROBE_PAD

    assert CB % PACK == 0
    sampling_locations, attention_weights, Qpad = _pad_queries(
        sampling_locations, attention_weights)
    NC = Qpad * GROUP // LANE
    idx, w = _prep_taps(spatial_shapes, sampling_locations,
                        attention_weights, tile_base)
    idx = idx.reshape(B * H, L, NC // CB, CB, 1, LANE)
    w = w.reshape(B * H, L, NC // CB, CB, 1, LANE)
    tmin, tmax = _chunk_windows(spatial_shapes, sampling_locations,
                                tile_base)

    out = pl.pallas_call(
        functools.partial(_msda_kernel, precision=_mxu_precision(value)),
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


def _msda_bwd_kernel(tmin_ref, tmax_ref, idx_ref, w_ref, val_ref, g_ref,
                     vdot_ref, gval_ref, *, precision):
    """Fused backward: per-tap value dots + grad_value scatter.

    Grid (BH, NC//CB, L), levels fastest.  ``gval_ref`` (the channel-major
    grad_value table) stays VMEM-resident per BH and accumulates across all
    (chunk-block, level) steps; ``vdot_ref`` mirrors the tap layout.
    Same probe structure as the forward: SMEM tile windows, unclamped
    probes over a zero-padded table, rare tail hoisted to one branch per
    grid step."""
    cblk = pl.program_id(1)
    l = pl.program_id(2)
    D = val_ref.shape[2]

    @pl.when((pl.program_id(1) == 0) & (l == 0))
    def _():
        gval_ref[...] = jnp.zeros_like(gval_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (QPC, LANE), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (QPC, LANE), 1)
    gt = (lanes // GROUP == rows).astype(jnp.float32)       # (QPC, LANE)
    lane_j = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)

    def chunk_rows(c):
        taps = idx_ref[0, 0, 0, c]                  # (1, LANE) int32
        w = w_ref[0, 0, 0, c]                       # (1, LANE) f32
        g8 = g_ref[0, c * QPC:(c + 1) * QPC, :]     # (QPC, D) f32
        # per-tap incoming-grad rows: R[d, k] = g8[query(k), d]
        R = jax.lax.dot_general(
            g8, gt, dimension_numbers=(((0,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)      # (D, LANE)
        taps_b = jnp.broadcast_to(taps, (D, LANE))
        lanec = taps_b & (LANE - 1)       # in-tile lane of each tap
        tt = jax.lax.shift_right_logical(taps_b, 7)  # true tile of each tap
        # probe-invariant scatter one-hot (lane identity); each probe only
        # masks it by tile identity
        ohl = (lanec[0:1] == lane_j)
        return w, R, R * w, lanec, tt, ohl

    def probe(t, lanec, tt, ohl, Rs, gvacc):
        """One probe: select tap values by exact tile identity (tt == t) and
        scatter this tile's rows.  The vdot reduction over D happens ONCE
        per probe-set in the caller (selects are disjoint across probes)."""
        tile = val_ref[0, t]                     # (D, LANE)
        g = jnp.take_along_axis(tile, lanec, axis=1)
        hit = tt == t
        gvacc = jnp.where(hit, g, gvacc)
        oh = (ohl & hit[0:1]).astype(jnp.float32)
        contrib = jax.lax.dot_general(
            Rs, oh, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)  # (D, LANE_j)
        gval_ref[0, t] += contrib
        return gvacc

    for c in range(CB):
        w, R, Rs, lanec, tt, ohl = chunk_rows(c)
        tmin = tmin_ref[0, l, cblk, c]
        gvacc = jnp.zeros((D, LANE), jnp.float32)
        for k in range(STATIC_PROBES):
            gvacc = probe(tmin + k, lanec, tt, ohl, Rs, gvacc)
        vdot_ref[0, 0, 0, c] = jnp.sum(gvacc * R, axis=0, keepdims=True)

    # two-level tail, mirroring the forward kernel's probe sets and its
    # per-TAIL_GROUP branch granularity
    for g0 in range(0, CB, TAIL_GROUP):
        group_overflow = jnp.zeros((), jnp.int32)
        for c in range(g0, g0 + TAIL_GROUP):
            group_overflow = jnp.maximum(
                group_overflow,
                tmax_ref[0, l, cblk, c] - tmin_ref[0, l, cblk, c])

        @pl.when(group_overflow >= STATIC_PROBES)
        def _(g0=g0):
            for c in range(g0, g0 + TAIL_GROUP):
                w, R, Rs, lanec, tt, ohl = chunk_rows(c)
                tmin = tmin_ref[0, l, cblk, c]
                tmax = tmax_ref[0, l, cblk, c]
                gvacc = jnp.zeros((D, LANE), jnp.float32)
                for j in range(TAIL_PROBES):
                    t = jnp.maximum(tmax - (TAIL_PROBES - 1) + j,
                                    tmin + STATIC_PROBES + j)
                    gvacc = probe(t, lanec, tt, ohl, Rs, gvacc)
                vdot_ref[0, 0, 0, c] += jnp.sum(gvacc * R, axis=0,
                                                keepdims=True)

        @pl.when(group_overflow >= STATIC_PROBES + TAIL_PROBES)
        def _(g0=g0):
            for c in range(g0, g0 + TAIL_GROUP):
                w, R, Rs, lanec, tt, ohl = chunk_rows(c)
                tmin = tmin_ref[0, l, cblk, c]
                tmax = tmax_ref[0, l, cblk, c]
                gvacc = jax.lax.fori_loop(
                    tmin + STATIC_PROBES, tmax - TAIL_PROBES + 1,
                    lambda t, vv: probe(t, lanec, tt, ohl, Rs, vv),
                    jnp.zeros((D, LANE), jnp.float32))
                vdot_ref[0, 0, 0, c] += jnp.sum(gvacc * R, axis=0,
                                                keepdims=True)


def _backward(value, spatial_shapes, sampling_locations, attention_weights,
              g):
    B, N, H, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(spatial_shapes)

    tile_base, T_total = _tile_bases(spatial_shapes)
    val = _value_tables(value, spatial_shapes, T_total)
    val = jnp.pad(val, ((0, 0), (0, PROBE_PAD), (0, 0), (0, 0)))
    Tp = T_total + PROBE_PAD
    locs_p, attn_p, Qpad = _pad_queries(sampling_locations,
                                        attention_weights)
    NC = Qpad * GROUP // LANE
    idx, w = _prep_taps(spatial_shapes, locs_p, attn_p, tile_base)
    idx = idx.reshape(B * H, L, NC // CB, CB, 1, LANE)
    w = w.reshape(B * H, L, NC // CB, CB, 1, LANE)
    tmin, tmax = _chunk_windows(spatial_shapes, locs_p, tile_base)
    g_bh = g.reshape(B, Q, H, D).transpose(0, 2, 1, 3).reshape(
        B * H, Q, D).astype(jnp.float32)
    g_bh = jnp.pad(g_bh, ((0, 0), (0, Qpad - Q), (0, 0)))

    vdot, gval = pl.pallas_call(
        functools.partial(_msda_bwd_kernel,
                          precision=_mxu_precision(value)),
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
            pl.BlockSpec((1, QPC * CB, D),
                         lambda bh, c, l: (bh, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 1, CB, 1, LANE),
                         lambda bh, c, l: (bh, l, c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, D, LANE),
                         lambda bh, c, l: (bh, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, L, NC // CB, CB, 1, LANE),
                                 jnp.float32),
            jax.ShapeDtypeStruct((B * H, Tp, D, LANE), jnp.float32),
        ),
    )(tmin, tmax, idx, w, val, g_bh)
    gval = gval[:, :T_total]  # drop the probe-pad zero tiles

    # unpack grad_value tables back to (B, N, H, D)
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

    # grads w.r.t. locations / attention weights: tap indices are
    # piecewise-constant in the locations (floor), so the exact gradient is
    # the vjp of the folded tap weights contracted with the per-tap value
    # dots — purely elementwise, no gathers.
    _, vjp_w = jax.vjp(
        lambda lo, at: _prep_taps(spatial_shapes, lo, at, tile_base)[1],
        locs_p, attn_p)
    g_loc_p, g_attn_p = vjp_w(vdot.reshape(B, H, L, Qpad * GROUP))
    g_loc = g_loc_p[:, :Q].astype(sampling_locations.dtype)
    g_attn = g_attn_p[:, :Q].astype(attention_weights.dtype)
    return g_val, g_loc, g_attn


def _fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = _forward(value, spatial_shapes, sampling_locations,
                   attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, res, g):
    value, locs, weights = res
    return _backward(value, spatial_shapes, locs, weights, g)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
