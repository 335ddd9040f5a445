"""Swin Transformer backbone (flax, NHWC).

Rebuilds mmdet's ``SwinTransformer``
(``third_party/mmdetection/mmdet/models/backbones/swin.py``; the fork adds a
``num_frames`` arg whose only effect is the (B,T,...)->(B*T,...) flatten,
``:748`` — handled by the caller here, as with ResNet).  Defaults are
Swin-L-p4-w7 as used by PETR (``configs/petr/petr_swin-l-...py``).

Windows are padded per-stage to multiples of ``window_size``; shifted
windows use the standard SW-MSA attention mask.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x, ws):
    """(B, H, W, C) -> (B*nH*nW, ws*ws, C); H, W divisible by ws."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(wins, ws, H, W):
    B = wins.shape[0] // ((H // ws) * (W // ws))
    x = wins.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + ws - 1
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowMSA(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        """x (nW, ws*ws, C); mask (nGroups, ws*ws, ws*ws) or None."""
        nW, L, C = x.shape
        H = self.num_heads
        D = C // H
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(nW, L, 3, H, D)
                            .transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]                       # (nW, H, L, D)
        attn = (q @ k.transpose(0, 1, 3, 2)) / jnp.sqrt(
            jnp.asarray(D, jnp.float32)).astype(self.dtype)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, H))
        idx = relative_position_index(self.window_size)
        bias = table[idx.reshape(-1)].reshape(L, L, H).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            g = mask.shape[0]
            attn = attn.reshape(nW // g, g, H, L, L) + mask[None, :, None]
            attn = attn.reshape(nW, H, L, L)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(nW, L, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: bool = False
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x (B, H, W, C)."""
        B, H, W, C = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)

        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        # mmdet shifts whenever configured, with no small-map special case
        # (``mmdet/models/backbones/swin.py`` ShiftWindowMSA.forward)
        shift_size = ws // 2 if self.shift else 0
        if shift_size:
            x = jnp.roll(x, (-shift_size, -shift_size), axis=(1, 2))
            # SW-MSA mask over padded grid
            img_mask = np.zeros((1, Hp, Wp, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift_size),
                       slice(-shift_size, None)):
                for wss in (slice(0, -ws), slice(-ws, -shift_size),
                            slice(-shift_size, None)):
                    img_mask[:, hs, wss] = cnt
                    cnt += 1
            mw = window_partition(jnp.asarray(img_mask), ws)[..., 0]
            attn_mask = jnp.where(
                mw[:, None, :] != mw[:, :, None], -100.0, 0.0
            ).astype(self.dtype)
        else:
            attn_mask = None

        wins = window_partition(x, ws)
        wins = WindowMSA(self.dim, self.num_heads, ws, dtype=self.dtype,
                         name="attn")(wins, attn_mask)
        x = window_reverse(wins, ws, Hp, Wp)
        if shift_size:
            x = jnp.roll(x, (shift_size, shift_size), axis=(1, 2))
        x = x[:, :H, :W]
        x = shortcut + x

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        # 2x2 neighborhood concat, torch order (x0=even/even, x1=odd/even
        # rows..., mmdet: [x0, x1, x2, x3] = [::2,::2], [1::2,::2],
        # [::2,1::2], [1::2,1::2])
        x = jnp.concatenate([
            x[:, 0::2, 0::2], x[:, 1::2, 0::2],
            x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin-L defaults; ``out_indices`` over stages 0..3."""
    embed_dims: int = 192
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    window_size: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    out_indices: Tuple[int, ...] = (1, 2, 3)
    patch_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(B, H, W, 3) -> tuple of stage features (B, h, w, C_i)."""
        p = self.patch_size
        B, H, W, _ = x.shape
        x = jnp.pad(x, ((0, 0), (0, (p - H % p) % p), (0, (p - W % p) % p),
                        (0, 0)))
        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p),
                    dtype=self.dtype, name="patch_embed")(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name="patch_norm")(x)

        outs = []
        dim = self.embed_dims
        for stage, depth in enumerate(self.depths):
            for blk in range(depth):
                x = SwinBlock(dim=dim, num_heads=self.num_heads[stage],
                              window_size=self.window_size,
                              shift=(blk % 2 == 1),
                              mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                              name=f"stage{stage}_block{blk}")(x)
            if stage in self.out_indices:
                y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name=f"out_norm{stage}")(x)
                outs.append(y)
            if stage < len(self.depths) - 1:
                x = PatchMerging(out_dim=dim * 2, dtype=self.dtype,
                                 name=f"merge{stage}")(x)
                dim *= 2
        return tuple(outs)
