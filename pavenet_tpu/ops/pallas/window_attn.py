"""Fused Pallas TPU kernel for windowed dense local attention.

The windowed encoder (``models/layers/windowed.py``, the opt-in TPU-mode
replacement for the reference's deformable encoder,
``mmdetection/mmdet/models/utils/transformer.py:502``) runs
non-overlapping (8, 16)-token window attention per pyramid level.  The
XLA formulation materializes the f32 score tensor in HBM — at the
800x1344 bucket that is ~316 MB per layer (603 windows x 8 heads x
128 x 128 x 4 B) plus a bf16 re-materialization of the attention
weights and partition/unpartition relayouts of q/k/v — ~1.5 GB of HBM
traffic per layer for ~10 GFLOP of attention math.

This kernel keeps one window-row of the level raster resident in VMEM
and runs scores -> mask -> softmax -> weighted-sum per (window, head)
without ever writing scores to HBM:

- q/k/v stay in the (B, Hp, Wp, C) raster layout (no host-side
  window_partition copies); the grid walks (batch, window-row) and each
  step slices its ``nWw`` windows out of the row block in VMEM;
- the key-padding mask rides along as a 0/1 f32 raster; masked keys get
  -1e9 logits exactly like the XLA path (fully-padded windows degrade
  to a uniform average of zeroed values — the caller zeroes ``v`` at
  padded keys, matching ``WindowedEncoderLayer`` semantics);
- scores/softmax accumulate in f32 on the MXU; the attention weights
  are cast to the value dtype for the second matmul, mirroring the XLA
  path's ``astype(self.dtype)``;
- the backward is a second Pallas kernel in the same layout that
  recomputes scores and softmax per window (flash-attention style —
  a 128-token window never needs tiling) and emits dq/dk/dv directly.

Window shifts (Swin-style half-window rolls) and padding to window
multiples stay outside in XLA: they are cheap fused copies, and keeping
them out of the kernel keeps the index maps static.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _fwd_kernel(q_ref, k_ref, v_ref, keep_ref, o_ref, *, num_heads, wh, ww):
    """One grid step = one (batch, window-row): (1, wh, Wp, C) blocks.

    ``keep_ref`` arrives pre-windowed as ``(1, 1, nWw, S)`` (see
    ``_window_keep``): a raster-layout ``(wh, ww) -> (1, S)`` reshape is a
    cross-lane relayout Mosaic cannot lower (``infer-vector-layout:
    unsupported shape cast``), so the windowing happens in XLA outside the
    kernel and each window's mask is a plain ``(1, S)`` lane-row slice here.
    """
    Wp, C = q_ref.shape[2], q_ref.shape[3]
    nww = Wp // ww
    S = wh * ww
    D = C // num_heads
    scale = 1.0 / (D ** 0.5)
    for j in range(nww):
        sl = slice(j * ww, (j + 1) * ww)
        qw = q_ref[0, :, sl, :].reshape(S, C)
        kw = k_ref[0, :, sl, :].reshape(S, C)
        vw = v_ref[0, :, sl, :].reshape(S, C)
        keep = keep_ref[0, 0, j:j + 1, :] > 0.5          # (1, S), no reshape
        heads = []
        for h in range(num_heads):
            hs = slice(h * D, (h + 1) * D)
            s = jax.lax.dot_general(
                qw[:, hs], kw[:, hs],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(keep, s, NEG)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            a = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_ref.dtype)
            heads.append(jnp.dot(a, vw[:, hs],
                                 preferred_element_type=jnp.float32))
        o = jnp.concatenate(heads, axis=-1)       # one wide store per window
        o_ref[0, :, sl, :] = o.astype(o_ref.dtype).reshape(wh, ww, C)


def _bwd_kernel(q_ref, k_ref, v_ref, keep_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, num_heads, wh, ww):
    """Recompute scores/softmax per window; emit dq/dk/dv (f32 math)."""
    Wp, C = q_ref.shape[2], q_ref.shape[3]
    nww = Wp // ww
    S = wh * ww
    D = C // num_heads
    scale = 1.0 / (D ** 0.5)
    for j in range(nww):
        sl = slice(j * ww, (j + 1) * ww)
        qw = q_ref[0, :, sl, :].reshape(S, C)
        kw = k_ref[0, :, sl, :].reshape(S, C)
        vw = v_ref[0, :, sl, :].reshape(S, C)
        gw = g_ref[0, :, sl, :].reshape(S, C)
        keep = keep_ref[0, 0, j:j + 1, :] > 0.5          # (1, S), no reshape
        dqs, dks, dvs = [], [], []
        for h in range(num_heads):
            hs = slice(h * D, (h + 1) * D)
            qh, kh, vh = qw[:, hs], kw[:, hs], vw[:, hs]
            gh = gw[:, hs].astype(jnp.float32)
            s = jax.lax.dot_general(
                qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(keep, s, NEG)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            a = e / jnp.sum(e, axis=-1, keepdims=True)          # (S, S) f32
            # d(attn @ v): da = g v^T ; dv = a^T g
            da = jax.lax.dot_general(
                gh, vh.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dvs.append(jax.lax.dot_general(
                a, gh, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            # softmax backward: ds = a * (da - rowsum(da * a))
            ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
            # masked logits have a == 0 -> ds == 0 there already
            dqs.append(jnp.dot(ds.astype(q_ref.dtype), kh,
                               preferred_element_type=jnp.float32) * scale)
            dks.append(jax.lax.dot_general(
                ds.astype(q_ref.dtype), qh,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale)
        for ref, parts in ((dq_ref, dqs), (dk_ref, dks), (dv_ref, dvs)):
            full = jnp.concatenate(parts, axis=-1)
            ref[0, :, sl, :] = full.astype(ref.dtype).reshape(wh, ww, C)


def _row_specs(B, Hp, Wp, C, *, wh):
    """BlockSpec for one (batch, window-row) of a raster."""
    return pl.BlockSpec((1, wh, Wp, C), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)


def _keep_spec(nww, S):
    """BlockSpec for one window-row of the pre-windowed keep mask."""
    return pl.BlockSpec((1, 1, nww, S), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)


def _window_keep(keep, wh, ww):
    """(B, Hp, Wp) 0/1 raster -> (B, nWh, nWw, S) windowed layout.

    Done in XLA (cheap fused copies on a tiny tensor) so the kernel never
    has to reshape across the lane dimension.
    """
    B, Hp, Wp = keep.shape
    k = keep.astype(jnp.float32).reshape(B, Hp // wh, wh, Wp // ww, ww)
    return k.transpose(0, 1, 3, 2, 4).reshape(
        B, Hp // wh, Wp // ww, wh * ww)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def window_attention(q, k, v, keep, num_heads, wh=8, ww=16,
                     interpret=False):
    """Fused window attention over padded level rasters.

    Args:
      q, k, v: ``(B, Hp, Wp, C)`` rasters, ``Hp % wh == 0``,
        ``Wp % ww == 0`` (pad + shift-roll happen in the caller).
      keep: ``(B, Hp, Wp)`` f32 0/1 — 1 where the key is real content.
      num_heads: head count; ``C % num_heads == 0``.
    Returns:
      ``(B, Hp, Wp, C)`` attention output, dtype of ``q``.
    """
    return _fwd(q, k, v, keep, num_heads, wh, ww, interpret)


def _fwd(q, k, v, keep, num_heads, wh, ww, interpret):
    B, Hp, Wp, C = q.shape
    kern = functools.partial(_fwd_kernel, num_heads=num_heads,
                             wh=wh, ww=ww)
    return pl.pallas_call(
        kern,
        grid=(B, Hp // wh),
        in_specs=[_row_specs(B, Hp, Wp, C, wh=wh)] * 3
        + [_keep_spec(Wp // ww, wh * ww)],
        out_specs=_row_specs(B, Hp, Wp, C, wh=wh),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, C), q.dtype),
        interpret=interpret,
    )(q, k, v, _window_keep(keep, wh, ww))


def _fwd_vjp(q, k, v, keep, num_heads, wh, ww, interpret):
    out = _fwd(q, k, v, keep, num_heads, wh, ww, interpret)
    return out, (q, k, v, keep)


def _bwd_vjp(num_heads, wh, ww, interpret, res, g):
    q, k, v, keep = res
    B, Hp, Wp, C = q.shape
    kern = functools.partial(_bwd_kernel, num_heads=num_heads,
                             wh=wh, ww=ww)
    spec = _row_specs(B, Hp, Wp, C, wh=wh)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(B, Hp // wh),
        in_specs=[spec] * 3 + [_keep_spec(Wp // ww, wh * ww), spec],
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, Hp, Wp, C), x.dtype)
            for x in (q, k, v)),
        interpret=interpret,
    )(q, k, v, _window_keep(keep, wh, ww), g)
    return dq, dk, dv, jnp.zeros_like(keep)


window_attention.defvjp(_fwd_vjp, _bwd_vjp)
