"""Deformable attention modules (flax).

Rebuilds, TPU-first, the reference attention family:

- ``MultiScaleDeformableAttention``: stock Deformable-DETR attention
  (``third_party/mmcv/mmcv/ops/multi_scale_deform_attn.py:208``).
- ``MultiFrameDeformableAttention``: T-parameterized version of the fork's
  ``MulFramesMultiScaleDeformableAttentionNumFrames3/5``
  (``multi_scale_deform_attn.py:1269,1591``) — per-frame offset/weight heads,
  per-frame deformable sampling, cross-frame fusion weighted by each frame's
  ``exp(raw_weights).sum`` (the reference's "BUG" block is its intended
  production behavior and is reproduced here).
- ``MultiFramePoseDeformableAttention``: T-parameterized version of
  ``MulFramesMultiScaleDeformablePoseAttentionNumFrames3/5``
  (``opera/models/utils/transformer.py:1544,2739``): K = num_keypoints
  sampling points whose box scale is the keypoint bounding box; with
  ``num_frames=1`` it degenerates to PETR's single-frame
  ``MultiScaleDeformablePoseAttention`` (``transformer.py:252``).

TPU design: the frame axis is folded into the batch axis for a **single**
``ms_deform_attn`` gather call per layer (the reference launches T CUDA
kernels); per-frame linear heads are one fused Dense of width ``T*...``.
Dead debug code in the reference forward (``transformer.py:1820-1830``)
is intentionally not reproduced.
"""
from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.ms_deform_attn import ms_deform_attn

Shapes = Tuple[Tuple[int, int], ...]


def spoke_offset_bias_init(num_heads: int, num_levels: int, num_points: int):
    """Deformable-DETR 'spoke' init: per-head unit directions scaled by
    point index (reference ``multi_scale_deform_attn.py:283-301``)."""
    def init(key, shape, dtype=jnp.float32):
        thetas = jnp.arange(num_heads, dtype=jnp.float32) * (
            2.0 * math.pi / num_heads)
        grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)
        grid = grid / jnp.abs(grid).max(-1, keepdims=True)
        grid = jnp.tile(grid[:, None, None, :],
                        (1, num_levels, num_points, 1))
        scale = jnp.arange(1, num_points + 1,
                           dtype=jnp.float32)[None, None, :, None]
        bias = (grid * scale).reshape(-1)
        assert bias.shape == shape, (bias.shape, shape)
        return bias.astype(dtype)
    return init


def _xavier_uniform():
    return nn.initializers.xavier_uniform()


class MultiScaleDeformableAttention(nn.Module):
    """Single-frame multi-scale deformable attention (encoder self-attn)."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    dropout: float = 0.1
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, value, reference_points,
                 spatial_shapes: Shapes, key_padding_mask=None,
                 identity=None, query_pos=None, deterministic: bool = True,
                 query_shapes: Shapes = None):
        """query (B,Q,C); value (B,N,C); reference_points (B,Q,L,2|4).

        ``query_shapes``: per-level (H, W) of the query raster when the
        queries are the flattened multi-level tokens themselves (encoder
        self-attn) — enables row-aligned chunking in the Pallas kernels.
        """
        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos
        B, Q, _ = query.shape
        N = value.shape[1]
        H, L, P = self.num_heads, self.num_levels, self.num_points
        D = self.embed_dims // H

        v = nn.Dense(self.embed_dims, dtype=self.dtype,
                     kernel_init=_xavier_uniform(), name="value_proj")(value)
        if key_padding_mask is not None:
            v = jnp.where(key_padding_mask[..., None], 0.0, v)
        v = v.reshape(B, N, H, D)

        offsets = nn.Dense(
            H * L * P * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=spoke_offset_bias_init(H, L, P),
            name="sampling_offsets")(query).reshape(B, Q, H, L, P, 2)
        weights = nn.Dense(
            H * L * P, dtype=self.dtype, kernel_init=nn.initializers.zeros,
            name="attention_weights")(query).reshape(B, Q, H, L * P)
        weights = jax.nn.softmax(weights, axis=-1).reshape(B, Q, H, L, P)

        locations = make_sampling_locations(
            reference_points, offsets, spatial_shapes, P)
        out = ms_deform_attn(v, spatial_shapes, locations, weights,
                             impl=self.impl, training=not deterministic,
                             query_shapes=query_shapes)
        out = nn.Dense(self.embed_dims, dtype=self.dtype,
                       kernel_init=_xavier_uniform(),
                       name="output_proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return identity + out


def make_sampling_locations(reference_points, offsets, spatial_shapes,
                            num_points):
    """Standard Deformable-DETR location rule for 2d / 4d references.

    reference_points: (..., Q, L, 2) point refs or (..., Q, L, 4) box refs
    offsets: (..., Q, H, L, P, 2)
    """
    if reference_points.shape[-1] == 2:
        normalizer = jnp.asarray(
            [[w, h] for h, w in spatial_shapes],
            dtype=offsets.dtype)  # (L, 2) in xy
        ref = reference_points[..., :, None, :, None, :]
        return ref + offsets / normalizer[None, :, None, :]
    elif reference_points.shape[-1] == 4:
        ref = reference_points[..., :, None, :, None, :]
        return ref[..., :2] + offsets / num_points * ref[..., 2:] * 0.5
    raise ValueError(
        f"reference_points last dim must be 2 or 4, got "
        f"{reference_points.shape[-1]}")


class _MultiFrameBase(nn.Module):
    """Shared machinery for the multi-frame attention variants."""
    num_frames: int = 3
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    dropout: float = 0.1
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32
    spoke_init: bool = True  # pose variants zero all offset biases

    def _project_value(self, value, key_padding_mask):
        """value (B,T,N,C); mask (B,T,N). Reference order: mask then proj
        (``multi_scale_deform_attn.py:1460-1465``)."""
        if key_padding_mask is not None:
            value = jnp.where(key_padding_mask[..., None], 0.0, value)
        v = nn.Dense(self.embed_dims, dtype=self.dtype,
                     kernel_init=_xavier_uniform(), name="value_proj")(value)
        B, T, N, _ = v.shape
        return v.reshape(B, T, N, self.num_heads,
                         self.embed_dims // self.num_heads)

    def _frame_heads(self, query):
        """Fused per-frame offset/weight heads.

        Returns offsets (B,T,Q,H,L,P,2), softmax weights (B,T,Q,H,L,P) and
        per-frame fusion weights (B,T,Q,H) = exp(raw).sum over L*P,
        normalized over frames.
        """
        B, Q, _ = query.shape
        T, H, L, P = (self.num_frames, self.num_heads, self.num_levels,
                      self.num_points)
        if self.spoke_init:
            def bias_init(key, shape, dtype=jnp.float32):
                one = spoke_offset_bias_init(H, L, P)(key, (H * L * P * 2,),
                                                      dtype)
                return jnp.tile(one, (T,))
        else:
            bias_init = nn.initializers.zeros
        offsets = nn.Dense(
            T * H * L * P * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=bias_init,
            name="sampling_offsets")(query)
        offsets = offsets.reshape(B, Q, T, H, L, P, 2).transpose(
            0, 2, 1, 3, 4, 5, 6)
        raw_w = nn.Dense(
            T * H * L * P, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="attention_weights")(query)
        raw_w = raw_w.reshape(B, Q, T, H, L * P).transpose(0, 2, 1, 3, 4)
        weights = jax.nn.softmax(raw_w, axis=-1).reshape(B, T, Q, H, L, P)
        # cross-frame fusion: exp-sum per frame, normalized over frames
        # (reference ``multi_scale_deform_attn.py:1489-1496,1572-1583``).
        frame_w = jnp.exp(raw_w).sum(-1)                # (B, T, Q, H)
        frame_w = frame_w / frame_w.sum(1, keepdims=True)
        return offsets, weights, frame_w

    def _attend_and_fuse(self, v, locations, weights, frame_w,
                         spatial_shapes, training=False):
        """Run one folded (B*T) deformable gather and fuse frames."""
        B, T, N, H, D = v.shape
        Q = locations.shape[2]
        out = ms_deform_attn(
            v.reshape(B * T, N, H, D), spatial_shapes,
            locations.reshape(B * T, Q, H, self.num_levels,
                              self.num_points, 2),
            weights.reshape(B * T, Q, H, self.num_levels, self.num_points),
            impl=self.impl, training=training)
        out = out.reshape(B, T, Q, H, D)
        out = (out * frame_w[..., None]).sum(axis=1)     # (B, Q, H, D)
        out = out.reshape(B, Q, H * D)
        out = nn.Dense(self.embed_dims, dtype=self.dtype,
                       kernel_init=_xavier_uniform(),
                       name="output_proj")(out)
        return out


class MultiFrameDeformableAttention(_MultiFrameBase):
    """Joint/refine-decoder cross-attention over T frames (P points)."""

    @nn.compact
    def __call__(self, query, value, reference_points,
                 spatial_shapes: Shapes, key_padding_mask=None,
                 identity=None, query_pos=None, deterministic: bool = True):
        """query (B,Q,C); value (B,T,N,C);
        reference_points (B,T,Q,L,2) per-frame points or (B,Q,L,4) shared
        boxes; key_padding_mask (B,T,N)."""
        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos
        v = self._project_value(value, key_padding_mask)
        offsets, weights, frame_w = self._frame_heads(query)

        if reference_points.shape[-1] == 2:
            locations = make_sampling_locations(
                reference_points, offsets, spatial_shapes, self.num_points)
        else:  # shared box references, broadcast over frames
            locations = make_sampling_locations(
                reference_points[:, None], offsets, spatial_shapes,
                self.num_points)
        out = self._attend_and_fuse(v, locations, weights, frame_w,
                                    spatial_shapes,
                                    training=not deterministic)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return identity + out


def pose_sampling_locations(reference_points, offsets):
    """Pose-aware rule: per-keypoint reference + kpt-bbox-scaled offsets
    (reference ``opera/models/utils/transformer.py:1763-1811``).

    reference_points: (..., Q, L, K*2); offsets: (..., Q, H, L, K, 2).
    Returns (..., Q, H, L, K, 2).
    """
    *lead, Q, L, K2 = reference_points.shape
    K = K2 // 2
    ref = reference_points.reshape(*lead, Q, L, K, 2)
    x1 = ref[..., 0].min(-1, keepdims=True)
    y1 = ref[..., 1].min(-1, keepdims=True)
    x2 = ref[..., 0].max(-1, keepdims=True)
    y2 = ref[..., 1].max(-1, keepdims=True)
    w = jnp.clip(x2 - x1, min=1e-4)
    h = jnp.clip(y2 - y1, min=1e-4)
    wh = jnp.stack([w, h], axis=-1)          # (..., Q, L, 1, 2)
    ref = ref[..., :, None, :, :, :]          # (..., Q, 1, L, K, 2)
    wh = wh[..., :, None, :, :, :]            # (..., Q, 1, L, 1, 2)
    return ref + offsets * wh * 0.5


class MultiFramePoseDeformableAttention(_MultiFrameBase):
    """Pose-decoder cross-attention: K keypoint sampling points per query.

    ``num_points`` must equal the number of keypoints. With
    ``num_frames == 1`` this is PETR's single-frame pose attention.
    """
    spoke_init: bool = False

    @nn.compact
    def __call__(self, query, value, reference_points,
                 spatial_shapes: Shapes, key_padding_mask=None,
                 identity=None, query_pos=None, deterministic: bool = True):
        """query (B,Q,C); value (B,T,N,C);
        reference_points (B,T,Q,L,K*2); key_padding_mask (B,T,N)."""
        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos
        assert reference_points.shape[-1] == self.num_points * 2, (
            f"pose attention requires K*2 references, got "
            f"{reference_points.shape[-1]} vs K={self.num_points}")
        v = self._project_value(value, key_padding_mask)
        offsets, weights, frame_w = self._frame_heads(query)
        locations = pose_sampling_locations(reference_points, offsets)
        out = self._attend_and_fuse(v, locations, weights, frame_w,
                                    spatial_shapes,
                                    training=not deterministic)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return identity + out
