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
from typing import Sequence, Tuple

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


def _bilinear_gather(value_l: jnp.ndarray, H: int, W: int,
                     loc: jnp.ndarray) -> jnp.ndarray:
    """Sample one level with bilinear interpolation + zero padding.

    Args:
        value_l: ``(B, H*W, heads, D)`` level tokens.
        loc: ``(B, Q, heads, P, 2)`` xy in [0,1] for this level.

    Returns:
        ``(B, Q, heads, P, D)`` sampled values.
    """
    B, _, nheads, D = value_l.shape
    Q, P = loc.shape[1], loc.shape[3]
    compute_dtype = value_l.dtype

    x = loc[..., 0].astype(jnp.float32) * W - 0.5
    y = loc[..., 1].astype(jnp.float32) * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0).astype(compute_dtype)
    ly = (y - y0).astype(compute_dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = jnp.zeros((B, Q, nheads, P, D), dtype=compute_dtype)
    one = jnp.asarray(1.0, compute_dtype)
    for dy, dx, wgt in (
            (0, 0, lambda: (one - ly) * (one - lx)),
            (0, 1, lambda: (one - ly) * lx),
            (1, 0, lambda: ly * (one - lx)),
            (1, 1, lambda: ly * lx),
    ):
        xi = x0i + dx
        yi = y0i + dy
        valid = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
        idx = (jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1))
        # (B, Q, heads, P) -> (B, Q*P, heads, 1) for a token-axis gather.
        idx_g = idx.transpose(0, 1, 3, 2).reshape(B, Q * P, nheads, 1)
        tap = jnp.take_along_axis(value_l, idx_g, axis=1)
        tap = tap.reshape(B, Q, P, nheads, D).transpose(0, 1, 3, 2, 4)
        w = (wgt() * valid.astype(compute_dtype))[..., None]
        out = out + tap * w
    return out


@functools.partial(jax.jit, static_argnames=("spatial_shapes",))
def ms_deform_attn_xla(value: jnp.ndarray,
                       spatial_shapes: Shapes,
                       sampling_locations: jnp.ndarray,
                       attention_weights: jnp.ndarray) -> jnp.ndarray:
    """XLA gather formulation of multi-scale deformable attention."""
    shapes = _as_static_shapes(spatial_shapes)
    B, N, nheads, D = value.shape
    Q = sampling_locations.shape[1]
    L = len(shapes)
    assert sampling_locations.shape[3] == L, (
        f"level mismatch: {sampling_locations.shape} vs {L} levels")
    assert sum(h * w for h, w in shapes) == N, (
        f"token count mismatch: {shapes} vs {N}")

    out = jnp.zeros((B, Q, nheads, D), dtype=value.dtype)
    start = 0
    for lvl, (H, W) in enumerate(shapes):
        value_l = jax.lax.slice_in_dim(value, start, start + H * W, axis=1)
        sampled = _bilinear_gather(
            value_l, H, W, sampling_locations[:, :, :, lvl])
        w = attention_weights[:, :, :, lvl].astype(value.dtype)[..., None]
        out = out + (sampled * w).sum(axis=3)
        start += H * W
    return out.reshape(B, Q, nheads * D)


def ms_deform_attn(value, spatial_shapes, sampling_locations,
                   attention_weights, impl: str = "xla"):
    """Dispatching wrapper; ``impl`` in {'xla', 'pallas'}."""
    if impl == "pallas":
        from .pallas.msda import ms_deform_attn_pallas
        return ms_deform_attn_pallas(
            value, spatial_shapes, sampling_locations, attention_weights)
    return ms_deform_attn_xla(
        value, spatial_shapes, sampling_locations, attention_weights)
