"""Sine positional encoding (reference: mmcv SinePositionalEncoding,
``third_party/mmcv/mmcv/cnn/bricks/transformer.py`` /
``mmdet/models/utils/positional_encoding.py``).

Computed from the *valid* (non-padded) region via cumulative sums over the
inverted mask, normalized to ``2*pi`` with the production config's
``offset=-0.5``.  Channel layout matches the reference: ``[y-feats, x-feats]``
with interleaved ``sin``/``cos``.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def sine_positional_encoding(mask: jnp.ndarray, num_feats: int = 128,
                             temperature: float = 10000.0,
                             normalize: bool = True,
                             offset: float = -0.5,
                             scale: float = 2 * math.pi,
                             eps: float = 1e-6,
                             dtype=jnp.float32) -> jnp.ndarray:
    """Args: mask ``(B, H, W)`` bool, True = padded. Returns ``(B,H,W,2F)``."""
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        y_embed = (y_embed + offset) / (y_embed[:, -1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, :, -1:] + eps) * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
        axis=-1).reshape(*x_embed.shape, num_feats)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
        axis=-1).reshape(*y_embed.shape, num_feats)
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)


class SinePositionalEncoding:
    """Thin config-driven wrapper matching the reference registry surface."""

    def __init__(self, num_feats=128, temperature=10000, normalize=True,
                 offset=-0.5, scale=2 * math.pi):
        self.num_feats = num_feats
        self.temperature = temperature
        self.normalize = normalize
        self.offset = offset
        self.scale = scale

    def __call__(self, mask, dtype=jnp.float32):
        return sine_positional_encoding(
            mask, self.num_feats, self.temperature, self.normalize,
            self.offset, self.scale, dtype=dtype)
