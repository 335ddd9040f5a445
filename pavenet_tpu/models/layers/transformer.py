"""Transformer bricks: FFN, MultiheadAttention, MLP.

Rebuilds the stock mmcv bricks used by the production path
(``third_party/mmcv/mmcv/cnn/bricks/transformer.py:407,1047``) as flax
modules.  Residual connections live inside the brick (mm-style, so the layer
operation order 'self_attn -> norm -> ffn -> norm' composes identically);
LayerNorm is applied by the enclosing layer.
"""
from __future__ import annotations


import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    """Plain MLP head: hidden layers with ReLU, linear output.

    Used for the kpt offset branches (reference
    ``videopose_head_mul_frames.py:178-185``: 256->512, relu, 2x(512->512,
    relu), 512->2K) and refine branches (256->256 relu x2, 256->2).
    """
    hidden_dims: tuple
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    zero_init_last: bool = False

    @nn.compact
    def __call__(self, x):
        for h in self.hidden_dims:
            x = nn.relu(nn.Dense(h, dtype=self.dtype)(x))
        kernel_init = (nn.initializers.zeros if self.zero_init_last
                       else nn.initializers.lecun_normal())
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        kernel_init=kernel_init)(x)


class FFN(nn.Module):
    """Feed-forward block with internal residual (mmcv FFN semantics)."""
    embed_dims: int = 256
    feedforward_channels: int = 1024
    num_fcs: int = 2
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, identity=None, deterministic: bool = True):
        out = x
        for _ in range(self.num_fcs - 1):
            out = nn.relu(nn.Dense(self.feedforward_channels,
                                   dtype=self.dtype)(out))
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.Dense(self.embed_dims, dtype=self.dtype)(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        if identity is None:
            identity = x
        return identity + out


class MultiheadAttention(nn.Module):
    """Standard MHA with internal residual + dropout (mmcv semantics).

    ``query_pos``/``key_pos`` are added to query/key before projection, as in
    DETR. Mask: ``key_padding_mask`` bool (B, N), True = padded.
    """
    embed_dims: int = 256
    num_heads: int = 8
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key=None, value=None, identity=None,
                 query_pos=None, key_pos=None, key_padding_mask=None,
                 deterministic: bool = True):
        if key is None:
            key = query
        if value is None:
            value = key
        if identity is None:
            identity = query
        if key_pos is None and query_pos is not None and (
                key.shape == query.shape):
            key_pos = query_pos
        q = query if query_pos is None else query + query_pos
        k = key if key_pos is None else key + key_pos

        mask = None
        if key_padding_mask is not None:
            # (B, 1, 1, N): attend where not padded
            mask = ~key_padding_mask[:, None, None, :]
        out = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.embed_dims,
            out_features=self.embed_dims,
            dropout_rate=0.0,
            dtype=self.dtype,
        )(q, k, value, mask=mask, deterministic=deterministic)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return identity + out
