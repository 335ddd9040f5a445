"""Multi-scale deformable attention sampling for TPU.

This is the rebuild of the reference's hot CUDA kernel
(``third_party/mmcv/mmcv/ops/csrc/common/cuda/ms_deform_attn_cuda_kernel.cuh``,
wrapped at ``third_party/mmcv/mmcv/ops/multi_scale_deform_attn.py:20``) as an
XLA-native gather formulation.  Semantics follow the reference contract
(SURVEY.md Appendix A):

- ``value``: ``(bs, sum_l H_l*W_l, num_heads, head_dim)``
- ``sampling_locations``: ``(bs, Q, heads, L, P, 2)``, xy normalized to
  ``[0, 1]`` **per level**
- ``attention_weights``: ``(bs, Q, heads, L, P)`` (already softmaxed over
  ``L*P`` by the caller)
- pixel-center convention ``x_im = x * W - 0.5`` (align_corners=False)
- out-of-range taps contribute **zero** (grid_sample zero padding)
- output: ``(bs, Q, heads * head_dim)``

Design notes (TPU): the sampling is expressed as four
``jnp.take_along_axis`` gathers per level over the flattened token axis,
fused with the bilinear weighting and the attention-weighted reduction.  All
shapes are static (``spatial_shapes`` must be a python tuple) so XLA can tile
the gathers; gradients fall out of AD as scatter-adds, matching the CUDA
backward's atomics.  A Pallas kernel is available behind the same API for the
hot encoder path (see ``pavenet_tpu/ops/pallas/msda.py``).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Shapes = Tuple[Tuple[int, int], ...]


def _as_static_shapes(spatial_shapes) -> Shapes:
    if isinstance(spatial_shapes, (list, tuple)):
        return tuple((int(h), int(w)) for h, w in spatial_shapes)
    raise TypeError(
        "spatial_shapes must be a static (python) sequence of (H, W); "
        f"got {type(spatial_shapes)} — traced shapes would force dynamic "
        "slicing and break XLA tiling.")


def _rows(v_bh: jnp.ndarray, i_bh: jnp.ndarray) -> jnp.ndarray:
    """Batched row gather: ``v (BH, N, D)``, ``i (BH, M)`` -> ``(BH, M, D)``.

    Expressed as vmapped fancy indexing so XLA receives one gather whose
    offset dim is the contiguous D row — NOT ``take_along_axis``, whose
    index broadcast over D materializes a ``(BH, M, D)`` int32 tensor
    (gigabytes at encoder scale; it crashed the TPU worker)."""
    return jax.vmap(lambda v, i: v[i])(v_bh, i_bh)


def _bilinear_gather(value_bh: jnp.ndarray, H: int, W: int, start: int,
                     loc: jnp.ndarray, weight: jnp.ndarray,
                     out: jnp.ndarray) -> jnp.ndarray:
    """Accumulate one level's attention-weighted bilinear samples.

    TPU formulation: the four bilinear taps of each sampling point are one
    ``(2, 2, D)`` block gather (a single index fetching a contiguous-ish
    512-byte slab) instead of four row gathers — XLA's gather on TPU is
    byte-rate-bound and block slices run ~2.5x faster for the same payload.
    Boundary exactness: the block start is clamped into range and each tap
    is weighted by ``relu(1 - |coord - tap_coord|)`` of its *actual*
    coordinate, which reproduces grid_sample zero-padding bit-for-bit
    (out-of-range taps get weight 0; clamp-shifted blocks still cover every
    in-range tap).

    Args:
        value_bh: ``(B*heads, N_total, D)`` all levels' tokens, head-major.
        start: token offset of this level.
        loc: ``(B, Q, heads, P, 2)`` xy in [0,1] for this level.
        weight: ``(B, Q, heads, P)`` attention weights for this level.
        out: ``(B*heads, Q, D)`` accumulator.
    """
    BH, _, D = value_bh.shape
    B, Q, nheads, P = weight.shape
    compute_dtype = value_bh.dtype
    attn = weight.astype(compute_dtype)

    x = loc[..., 0].astype(jnp.float32) * W - 0.5
    y = loc[..., 1].astype(jnp.float32) * H - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)

    if H < 2 or W < 2:
        # degenerate level: fall back to per-tap row gathers
        one = jnp.asarray(1.0, compute_dtype)
        lx = (x - x0).astype(compute_dtype)
        ly = (y - y0).astype(compute_dtype)
        for dy, dx, wgt in ((0, 0, lambda: (one - ly) * (one - lx)),
                            (0, 1, lambda: (one - ly) * lx),
                            (1, 0, lambda: ly * (one - lx)),
                            (1, 1, lambda: ly * lx)):
            xi, yi = x0 + dx, y0 + dy
            valid = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
            idx = (start + jnp.clip(yi, 0, H - 1) * W
                   + jnp.clip(xi, 0, W - 1))
            idx_bh = idx.transpose(0, 2, 1, 3).reshape(BH, Q * P)
            tap = _rows(value_bh, idx_bh)
            w = (wgt() * valid.astype(compute_dtype) * attn)
            out = out + (tap * w.transpose(0, 2, 1, 3).reshape(
                BH, Q * P, 1)).reshape(BH, Q, P, D).sum(2)
        return out

    ys = jnp.clip(y0, 0, H - 2)                      # block start row
    xs = jnp.clip(x0, 0, W - 2)
    # tap weights from actual tap coordinates (exact zero-padding rule)
    wy0 = jnp.maximum(1.0 - jnp.abs(y - ys), 0.0)
    wy1 = jnp.maximum(1.0 - jnp.abs(y - (ys + 1)), 0.0)
    wx0 = jnp.maximum(1.0 - jnp.abs(x - xs), 0.0)
    wx1 = jnp.maximum(1.0 - jnp.abs(x - (xs + 1)), 0.0)
    # (B, Q, heads, P, 2, 2) bilinear weights * attention weight
    wgt = (jnp.stack([
        jnp.stack([wy0 * wx0, wy0 * wx1], -1),
        jnp.stack([wy1 * wx0, wy1 * wx1], -1)], -2)
        .astype(compute_dtype) * attn[..., None, None])

    # block gather: (BH, M, 2) starts -> (BH, M, 2, 2, D)
    value_l = jax.lax.slice_in_dim(
        value_bh, start, start + H * W, axis=1).reshape(BH, H, W, D)
    starts = jnp.stack([ys, xs], -1).transpose(0, 2, 1, 3, 4).reshape(
        BH, Q * P, 2)

    def per_bh(vb, st):
        return jax.lax.gather(
            vb, st,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1)),
            slice_sizes=(2, 2, D), mode=jax.lax.GatherScatterMode.CLIP)

    taps = jax.vmap(per_bh)(value_l, starts)          # (BH, QP, 2, 2, D)
    w_bh = wgt.transpose(0, 2, 1, 3, 4, 5).reshape(BH, Q * P, 2, 2, 1)
    return out + (taps * w_bh).sum((2, 3)).reshape(BH, Q, P, D).sum(2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_xla(value, spatial_shapes, sampling_locations,
                       attention_weights):
    """XLA gather formulation of multi-scale deformable attention.

    Custom VJP: XLA transposes the (2,2,D)-slice gather into a slice
    scatter that runs ~25x slower than the forward on v5e (measured 8.2s
    per encoder-scale call); ``grad_value`` is instead computed with fast
    row scatter-adds (~9ns/index) and grads w.r.t. locations/weights via AD
    of a value-constant closure (gathers only).
    """
    return _ms_deform_attn_fwd_impl(value, spatial_shapes,
                                    sampling_locations, attention_weights)


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def _ms_deform_attn_fwd_impl(value: jnp.ndarray,
                             spatial_shapes: Shapes,
                             sampling_locations: jnp.ndarray,
                             attention_weights: jnp.ndarray) -> jnp.ndarray:
    shapes = _as_static_shapes(spatial_shapes)
    B, N, nheads, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(shapes)
    assert sampling_locations.shape[3] == L, (
        f"level mismatch: {sampling_locations.shape} vs {L} levels")
    assert sum(h * w for h, w in shapes) == N, (
        f"token count mismatch: {shapes} vs {N}")

    # head-major layout: one contiguous (N, D) table per (batch, head)
    value_bh = value.transpose(0, 2, 1, 3).reshape(B * nheads, N, D)
    out = jnp.zeros((B * nheads, Q, D), dtype=value.dtype)
    start = 0
    for lvl, (H, W) in enumerate(shapes):
        out = _bilinear_gather(
            value_bh, H, W, start,
            sampling_locations[:, :, :, lvl],
            attention_weights[:, :, :, lvl], out)
        start += H * W
    out = out.reshape(B, nheads, Q, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, nheads * D)


# taps-per-(batch*head) ceiling for the dense (matmul) value gradient:
# its FLOPs scale with sum_l H_l*W_l*D per tap (~5.5 ns/tap at decoder
# scale on v5e) while the scatter costs ~68 ns/tap but is N-independent.
# Decoder-family calls (Q*P <= ~4.5k) win ~40x with dense; encoder-scale
# calls (Q*P ~90k) would pay teraflops and stay on the scatter (the hot
# encoder path uses the Pallas corner-stream backward anyway).
_DENSE_GRAD_MAX_TAPS = 16384


def _grad_value_dense(value, shapes, locations, weights, g):
    """grad wrt value as per-level structured-one-hot matmuls (no scatter).

    The 2x2 bilinear footprint is separable: the four corner updates of a
    tap at block (ys, xs) are (wy0 + wy1 shifted) x (wx0 + wx1 shifted),
    so the accumulated gradient over taps factors into

        g_val[y, x, d] = sum_q wy_d[q, y] * wx_d[q, x] * upd[q, d]

    with ``wy_d``/``wx_d`` built by iota-compare (two nonzeros per row —
    never materialized as scatter indices) and the attention weight
    folded into ``wx_d``.  One einsum per level contracts over taps on
    the MXU; the TPU scatter unit (measured ~68 ns/tap, 145 ms for one
    pose-attention call) is bypassed entirely.  Semantics identical to
    ``_grad_value_rows``: block starts clamped to [0, H-2], degenerate
    H<2 / W<2 levels drop the +1 term because the iota never matches.

    Matmul operands are taken at ``value.dtype`` (fp32 accumulation):
    f32 models (every parity/exactness gate) contract exactly at
    HIGHEST; bf16 models round the per-tap updates to bf16, one extra
    rounding below the model's own activation quantization floor — the
    same dtype-derived contract as the Pallas kernels' MXU precision
    (``pallas/msda.py:_mxu_precision``).
    """
    B, N, nheads, D = value.shape
    Q = locations.shape[1]
    BH = B * nheads
    cdtype = value.dtype
    prec = (jax.lax.Precision.DEFAULT if cdtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    g_bh = g.reshape(B, Q, nheads, D).transpose(0, 2, 1, 3).reshape(
        BH, Q, 1, D).astype(cdtype)
    pieces = []
    for lvl, (H, W) in enumerate(shapes):
        loc = locations[:, :, :, lvl]
        attn = weights[:, :, :, lvl].astype(jnp.float32)
        P = loc.shape[3]
        x = loc[..., 0].astype(jnp.float32) * W - 0.5
        y = loc[..., 1].astype(jnp.float32) * H - 0.5
        ys = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, max(H - 2, 0))
        xs = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, max(W - 2, 0))
        wy0 = jnp.maximum(1.0 - jnp.abs(y - ys), 0.0)
        wy1 = jnp.maximum(1.0 - jnp.abs(y - (ys + 1)), 0.0)
        wx0 = jnp.maximum(1.0 - jnp.abs(x - xs), 0.0)
        wx1 = jnp.maximum(1.0 - jnp.abs(x - (xs + 1)), 0.0)
        tr = lambda a: a.transpose(0, 2, 1, 3).reshape(BH, Q * P)
        ys_, xs_ = tr(ys), tr(xs)
        yy = jnp.arange(H, dtype=jnp.int32)
        xx = jnp.arange(W, dtype=jnp.int32)
        wy_d = (tr(wy0)[..., None] * (yy == ys_[..., None])
                + tr(wy1)[..., None]
                * (yy == ys_[..., None] + 1)).astype(cdtype)
        wx_d = ((tr(wx0) * tr(attn))[..., None] * (xx == xs_[..., None])
                + (tr(wx1) * tr(attn))[..., None]
                * (xx == xs_[..., None] + 1)).astype(cdtype)
        upd = jnp.broadcast_to(g_bh, (BH, Q, P, D)).reshape(BH, Q * P, D)
        m1 = (wx_d[..., :, None] * upd[..., None, :]).reshape(
            BH, Q * P, W * D)
        out_l = jnp.einsum("bqy,bqm->bym", wy_d, m1,
                           preferred_element_type=jnp.float32,
                           precision=prec)
        pieces.append(out_l.reshape(BH, H * W, D))
    out = jnp.concatenate(pieces, 1)
    return out.reshape(B, nheads, N, D).transpose(0, 2, 1, 3).astype(
        value.dtype)


def _grad_value_rows(value, shapes, locations, weights, g):
    """grad wrt value via per-corner row scatter-adds (fast on TPU)."""
    B, N, nheads, D = value.shape
    Q = locations.shape[1]
    BH = B * nheads
    g_bh = g.reshape(B, Q, nheads, D).transpose(0, 2, 1, 3).reshape(
        BH, Q, 1, D)
    out = jnp.zeros((BH, N, D), jnp.float32)
    start = 0
    for lvl, (H, W) in enumerate(shapes):
        loc = locations[:, :, :, lvl]
        attn = weights[:, :, :, lvl].astype(jnp.float32)
        P = loc.shape[3]
        x = loc[..., 0].astype(jnp.float32) * W - 0.5
        y = loc[..., 1].astype(jnp.float32) * H - 0.5
        ys = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, max(H - 2, 0))
        xs = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, max(W - 2, 0))
        wy = (jnp.maximum(1.0 - jnp.abs(y - ys), 0.0),
              jnp.maximum(1.0 - jnp.abs(y - (ys + 1)), 0.0))
        wx = (jnp.maximum(1.0 - jnp.abs(x - xs), 0.0),
              jnp.maximum(1.0 - jnp.abs(x - (xs + 1)), 0.0))
        for r in range(2):
            for c in range(2):
                if H < 2 and r == 1:
                    continue
                if W < 2 and c == 1:
                    continue
                yy = jnp.clip(ys + r, 0, H - 1)
                xx = jnp.clip(xs + c, 0, W - 1)
                idx = (start + yy * W + xx).transpose(0, 2, 1, 3).reshape(
                    BH, Q * P)
                wgt = (wy[r] * wx[c] * attn).transpose(0, 2, 1, 3).reshape(
                    BH, Q, P, 1)
                upd = (wgt * g_bh.astype(jnp.float32)).reshape(BH, Q * P, D)
                out = jax.vmap(lambda o, i, u: o.at[i].add(u))(out, idx, upd)
        start += H * W
    return out.reshape(B, nheads, N, D).transpose(0, 2, 1, 3).astype(
        value.dtype)


def _msda_xla_fwd(value, spatial_shapes, sampling_locations,
                  attention_weights):
    out = _ms_deform_attn_fwd_impl(value, spatial_shapes,
                                   sampling_locations, attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _msda_xla_bwd(spatial_shapes, res, g):
    value, locs, weights = res
    shapes = _as_static_shapes(spatial_shapes)
    # grads wrt locations/weights: AD with value held constant (no scatter)
    _, vjp_lw = jax.vjp(
        lambda l, w: _ms_deform_attn_fwd_impl(value, spatial_shapes, l, w),
        locs, weights)
    g_loc, g_w = vjp_lw(g)
    if locs.shape[1] * locs.shape[4] <= _DENSE_GRAD_MAX_TAPS:
        g_val = _grad_value_dense(value, shapes, locs, weights, g)
    else:
        g_val = _grad_value_rows(value, shapes, locs, weights, g)
    return g_val, g_loc, g_w


ms_deform_attn_xla.defvjp(_msda_xla_fwd, _msda_xla_bwd)


def _wrap_can_overflow(lq, query_shapes, sampled_shapes=None, multiple=32):
    """Can a 32-query chunk of query level ``lq`` that straddles a row
    wrap overflow the kernels' 4-tile static probe window on some sampled
    level?  Worst-case window (tokens) for sampled level with width Ws and
    query->sampled column ratio r: within-row x-span ``multiple*r`` plus
    the 2x2 bilinear footprint ``Ws + 1`` plus the wrap's row jump
    ``r * Ws``.  Finest-level queries (r <= 1 everywhere) never overflow
    and should not pay the ~14% pad-query cost (measured: aligning all
    levels REGRESSED the flagship clip 237 -> 265 ms).

    ``sampled_shapes``: the *value* raster per level (spatial_shapes).
    Defaults to ``query_shapes`` (true for encoder self-attention, the
    only in-model user), but callers whose query raster differs from the
    value levels must pass it for a correct estimate."""
    from .pallas.msda import LANE, STATIC_PROBES
    if sampled_shapes is None:
        sampled_shapes = query_shapes
    Wq = query_shapes[lq][1]
    worst = max(multiple * max(1, Ws // Wq) + Ws + 1
                + max(1, Ws // Wq) * Ws
                for (_, Ws) in sampled_shapes)
    # tmax - tmin <= (worst + LANE - 1) // LANE; tail fires at >= 4
    return (worst + LANE - 1) // LANE >= STATIC_PROBES


def _row_align(query_shapes, locations, weights, multiple=32,
               sampled_shapes=None):
    """Pad each level's query rows to a multiple of ``multiple`` queries.

    The Pallas kernels chunk 32 consecutive queries; when encoder
    self-attention queries are a multi-level raster, a chunk that
    straddles a feature-row wrap sees its per-chunk tile window jump by
    ~``W_level`` tokens on every finer sampled level — the structural
    source of the kernels' warm overflow tail (PERF_NOTES).  Padding each
    query row so chunks never straddle a wrap trades ~16% more main-loop
    chunks for a cold tail.  Pad queries replicate the row's last
    location (keeps chunk windows tight) with ZERO attention weights
    (their outputs are exactly zero and are sliced away, so cotangents
    reaching the kernel for them are zero too — the alignment can sit
    outside the custom-VJP boundary).  Returns (locations, weights,
    segs) with segs = (padded_start, Hl, Wl, Wp) per level."""
    B = locations.shape[0]
    trail_l = locations.shape[3:]
    trail_w = weights.shape[3:]
    H = locations.shape[2]
    assert sum(h * w for h, w in query_shapes) == locations.shape[1], (
        "query_shapes must tile the query axis (raster self-attention)")
    locs_parts, w_parts, segs = [], [], []
    start, pstart = 0, 0
    for lq, (Hl, Wl) in enumerate(query_shapes):
        n = Hl * Wl
        Wp = (-(-Wl // multiple) * multiple
              if _wrap_can_overflow(lq, query_shapes, sampled_shapes)
              else Wl)
        lseg = locations[:, start:start + n].reshape(
            (B, Hl, Wl, H) + trail_l)
        wseg = weights[:, start:start + n].reshape((B, Hl, Wl, H) + trail_w)
        if Wp != Wl:
            pad = Wp - Wl
            lseg = jnp.concatenate(
                [lseg, jnp.broadcast_to(lseg[:, :, -1:],
                                        (B, Hl, pad, H) + trail_l)], axis=2)
            wseg = jnp.concatenate(
                [wseg, jnp.zeros((B, Hl, pad, H) + trail_w, wseg.dtype)],
                axis=2)
        lseg = lseg.reshape((B, Hl * Wp, H) + trail_l)
        wseg = wseg.reshape((B, Hl * Wp, H) + trail_w)
        # Round the segment to a chunk boundary so the NEXT level starts
        # chunk-aligned: an unpadded level whose Hl*Wl is not a multiple
        # of ``multiple`` (e.g. level 0 of the 800x1120 bucket, 100*140 =
        # 14000 tokens) would otherwise leave every later row-padded
        # level starting mid-chunk — chunks still straddle row wraps and
        # the pad-query cost buys nothing.  <32 inert queries per level.
        tail = (-(Hl * Wp)) % multiple
        if tail:
            lseg = jnp.concatenate(
                [lseg, jnp.broadcast_to(lseg[:, -1:],
                                        (B, tail, H) + trail_l)], axis=1)
            wseg = jnp.concatenate(
                [wseg, jnp.zeros((B, tail, H) + trail_w, wseg.dtype)],
                axis=1)
        locs_parts.append(lseg)
        w_parts.append(wseg)
        segs.append((pstart, Hl, Wl, Wp))
        assert pstart % multiple == 0
        pstart += Hl * Wp + tail
        start += n
    return (jnp.concatenate(locs_parts, 1), jnp.concatenate(w_parts, 1),
            segs)


def _row_unalign(out, segs):
    """Drop the pad queries inserted by ``_row_align`` from (B, Q', C)."""
    B, _, C = out.shape
    parts = []
    for (pstart, Hl, Wl, Wp) in segs:
        seg = out[:, pstart:pstart + Hl * Wp].reshape(B, Hl, Wp, C)
        parts.append(seg[:, :, :Wl].reshape(B, Hl * Wl, C))
    return jnp.concatenate(parts, 1)


def ms_deform_attn(value, spatial_shapes, sampling_locations,
                   attention_weights, impl: str = "auto",
                   training: bool = False, query_shapes=None):
    """Dispatching wrapper; ``impl`` in {'auto', 'xla', 'pallas', 'cs'}.

    'auto' picks a Pallas kernel on TPU when its layout constraints hold
    (P*4 taps == 16 per query-level, i.e. the standard P=4; also a ~40x
    faster compile); the pose-attention shape (P=K) and non-TPU backends
    use the XLA block-gather formulation.  All are exact (tested to 1e-7)
    and all have fused custom backwards.

    'auto' resolves to the second-generation corner-stream kernel ('cs',
    pallas/msda_cs.py — native-layout prep, 1.2-1.7x the first-gen
    forward) in BOTH modes since round 3: the round-2 quarantine of its
    native backward is lifted (the corruption was an XLA prep-fusion
    miscompile, not the kernel — see msda_cs._prep_streams), and the
    native cs backward measures 425 vs 614 ms/call against the first-gen
    fwd+grad at f32 encoder scale.  ``training`` is kept in the
    signature for call-site clarity and A/B harnesses.

    ``query_shapes``: per-level (H, W) of the *query* raster when queries
    are flattened multi-level tokens in raster order (encoder self-attn).
    Enables row-aligned chunking on the Pallas paths (see ``_row_align``);
    exactness is unaffected.
    """
    if impl == "auto":
        import jax as _jax
        P = sampling_locations.shape[-2]
        # P != 4 stays on XLA: the 'pallas_split' point-folding path wins
        # standalone (6.4 vs 9.3 ms on the decoder shape) but loses
        # in-model on v5e (clip 496 -> 526 ms; XLA overlaps the small
        # decoder gathers with other work) and costs a pathological
        # ~40 min Mosaic compile for the extra kernel specialization.
        if P == 4 and _jax.default_backend() == "tpu":
            impl = "cs"
        else:
            impl = "xla"
    if impl in ("pallas", "cs"):
        if impl == "pallas":
            from .pallas.msda import ms_deform_attn_pallas as kern
        else:
            # second-generation corner-stream kernel (pallas/msda_cs.py):
            # native-layout prep (no corner interleave, half the stream
            # bytes), corners folded in-kernel; backward via the proven
            # msda.py fused backward (see msda_cs._bwd for the Mosaic
            # note).
            from .pallas.msda_cs import ms_deform_attn_cs as kern
        sampled = _as_static_shapes(spatial_shapes)
        if query_shapes is not None and any(
                _wrap_can_overflow(lq, query_shapes, sampled)
                for lq in range(len(query_shapes))):
            locs, wts, segs = _row_align(
                query_shapes, sampling_locations, attention_weights,
                sampled_shapes=sampled)
            out = kern(value, spatial_shapes, locs, wts)
            return _row_unalign(out, segs)
        return kern(value, spatial_shapes, sampling_locations,
                    attention_weights)
    if impl == "pallas_split":
        # the op is linear over sampling points, and the kernel layout
        # wants exactly 4 points per query: zero-pad P to a multiple of 4
        # and fold the point groups into the query axis, then regroup-sum.
        # This routes the pose-aware attention (P = num_keypoints, e.g.
        # 15) through the Pallas kernel too.
        from .pallas.msda import ms_deform_attn_pallas
        B, Q, H, L, P, _ = sampling_locations.shape
        k = -(-P // 4)
        pad = k * 4 - P
        loc = jnp.pad(sampling_locations,
                      ((0, 0),) * 4 + ((0, pad), (0, 0)))
        wts = jnp.pad(attention_weights, ((0, 0),) * 4 + ((0, pad),))
        loc = loc.reshape(B, Q, H, L, k, 4, 2).transpose(0, 1, 4, 2, 3, 5, 6)
        loc = loc.reshape(B, Q * k, H, L, 4, 2)
        wts = wts.reshape(B, Q, H, L, k, 4).transpose(0, 1, 4, 2, 3, 5)
        wts = wts.reshape(B, Q * k, H, L, 4)
        out = ms_deform_attn_pallas(value, spatial_shapes, loc, wts)
        return out.reshape(B, Q, k, -1).sum(2)
    # rematerialize the sampling in backward: the gathered-tap
    # intermediates are the dominant training-memory cost (recompute
    # beats storing them).  Measured UNCONDITIONAL even at decoder
    # scale: dropping the checkpoint for small-tap calls (pose/joint
    # attention, taps ~14M elems) made the full fwd+grad 925 -> 1016 ms
    # at 800x1344 bf16 — storing taps extends their live range across
    # the backward and loses more to scheduling than the recompute
    # costs (PERF_NOTES "Round 4: training backward anatomy").
    fn = jax.checkpoint(
        lambda v, l, w: ms_deform_attn_xla(v, spatial_shapes, l, w))
    return fn(value, sampling_locations, attention_weights)
