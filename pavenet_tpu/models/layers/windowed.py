"""Windowed dense-local-attention encoder layer — the opt-in "TPU-mode"
encoder (``encoder_mode='windowed'``).

Motivation (PERF_NOTES "the gather wall"): the parity encoder's
multi-scale deformable self-attention is index-bound on TPU — v5e has no
fast-gather unit, so ~21 cycles/lane-lookup caps the kernel far below
the MXU's throughput.  This variant replaces the per-layer deformable
gather with non-overlapping-window DENSE attention per pyramid level —
pure (128 x 128)-shaped MXU matmuls, zero gathers — so the encoder's
arithmetic rides the systolic array at full tilt.  Deformable sampling
offsets at converged checkpoints concentrate within a few strides of the
query (the spoke init is +-P strides), so a (8, 16)-token window with
Swin-style alternating half-window shifts covers a comparable receptive
field per layer; cross-level mixing still happens through the two-stage
proposals and the (unchanged, still deformable) pose/joint decoders.

This is a TPU-native DESIGN variant, not a parity component: it has no
reference counterpart (the reference is CUDA-gather-based throughout),
cannot load the reference's converted encoder weights (different
parameter shapes), and needs stage-2/3 retraining for accuracy numbers —
see PERF_NOTES "Round 3: windowed encoder" for the measured speed and
the accuracy-validation plan.  The parity (deformable) encoder stays the
default everywhere.

Structural notes:
- window = (8, 16) = 128 tokens -> one MXU tile per attention matrix;
  levels smaller than a window collapse to a single padded window.
- odd layers shift the raster by half a window (jnp.roll).  Rolled
  windows wrap across image edges; with bucket padding between the
  content and the wrap the practical leakage is masked padding, which
  attention masks out (Swin's region masks are deliberately skipped —
  they cost more than they buy at these window sizes).
- padded keys (bucket padding + window padding) get -1e9 logits and
  zeroed values, mirroring the deformable path's ``key_padding_mask``
  semantics; fully-padded windows degrade to zeros.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Shapes = Tuple[Tuple[int, int], ...]

WINDOW = (8, 16)  # (wh, ww): 128 tokens = one MXU tile side


def _pad_to(x, Hl, Wl, wh, ww):
    """(B, Hl, Wl, ...) -> padded to window multiples (Hp, Wp)."""
    Hp = -(-Hl // wh) * wh
    Wp = -(-Wl // ww) * ww
    if (Hp, Wp) != (Hl, Wl):
        pad = [(0, 0), (0, Hp - Hl), (0, Wp - Wl)] + [(0, 0)] * (x.ndim - 3)
        x = jnp.pad(x, pad)
    return x, Hp, Wp


def window_partition(x, Hl, Wl, wh=WINDOW[0], ww=WINDOW[1], shift=False):
    """(B, Hl*Wl, C) raster -> (B * nW, wh*ww, C) windows (static shapes).

    ``shift``: roll the raster by half a window first (Swin shifted
    windows; wrap-around is masked only through the padding mask)."""
    B = x.shape[0]
    trail = x.shape[2:]
    x = x.reshape((B, Hl, Wl) + trail)
    if shift:
        x = jnp.roll(x, (-(wh // 2), -(ww // 2)), axis=(1, 2))
    x, Hp, Wp = _pad_to(x, Hl, Wl, wh, ww)
    x = x.reshape((B, Hp // wh, wh, Wp // ww, ww) + trail)
    x = x.transpose((0, 1, 3, 2, 4) + tuple(range(5, x.ndim)))
    return x.reshape((B * (Hp // wh) * (Wp // ww), wh * ww) + trail)


def window_unpartition(w, B, Hl, Wl, wh=WINDOW[0], ww=WINDOW[1],
                       shift=False):
    """Inverse of :func:`window_partition` -> (B, Hl*Wl, C)."""
    trail = w.shape[2:]
    Hp = -(-Hl // wh) * wh
    Wp = -(-Wl // ww) * ww
    x = w.reshape((B, Hp // wh, Wp // ww, wh, ww) + trail)
    x = x.transpose((0, 1, 3, 2, 4) + tuple(range(5, x.ndim)))
    x = x.reshape((B, Hp, Wp) + trail)
    x = x[:, :Hl, :Wl]
    if shift:
        x = jnp.roll(x, (wh // 2, ww // 2), axis=(1, 2))
    return x.reshape((B, Hl * Wl) + trail)


def _attend_level_pallas(q, k, v, kpm, Hl, Wl, num_heads, wh, ww, shift):
    """One level's window attention through the fused Pallas kernel.

    Equivalent math to the XLA partition path below, but scores/softmax
    never leave VMEM and q/k/v stay in raster layout (shift-roll and
    window-multiple padding are the only XLA-side copies).  ``v`` is
    already zeroed at padded keys by the caller.
    """
    from ...ops.pallas.window_attn import window_attention

    B, n, C = q.shape
    keep = (jnp.ones((B, n), jnp.float32) if kpm is None
            else 1.0 - kpm.astype(jnp.float32))
    rasters = [x.reshape(B, Hl, Wl, -1) for x in (q, k, v)]
    keep = keep.reshape(B, Hl, Wl)
    if shift:
        rasters = [jnp.roll(x, (-(wh // 2), -(ww // 2)), axis=(1, 2))
                   for x in rasters]
        keep = jnp.roll(keep, (-(wh // 2), -(ww // 2)), axis=(1, 2))
    Hp = -(-Hl // wh) * wh
    Wp = -(-Wl // ww) * ww
    if (Hp, Wp) != (Hl, Wl):
        pad3 = [(0, 0), (0, Hp - Hl), (0, Wp - Wl)]
        rasters = [jnp.pad(x, pad3 + [(0, 0)]) for x in rasters]
        keep = jnp.pad(keep, pad3)
    qr, kr, vr = rasters
    interpret = jax.default_backend() != "tpu"
    out = window_attention(qr, kr, vr, keep, num_heads, wh, ww, interpret)
    out = out[:, :Hl, :Wl]
    if shift:
        out = jnp.roll(out, (wh // 2, ww // 2), axis=(1, 2))
    return out.reshape(B, n, C)


class WindowedEncoderLayer(nn.Module):
    """Drop-in replacement for ``EncoderLayer`` (same call signature; the
    deformable ``reference_points`` argument is accepted and ignored)."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4          # unused; kept signature-compatible
    num_points: int = 4          # unused
    feedforward_channels: int = 1024
    dropout: float = 0.1
    shift: bool = False          # odd layers shift by half a window
    impl: str = "auto"           # 'auto' | 'xla' | 'pallas'
    dtype: jnp.dtype = jnp.float32

    def _use_pallas(self) -> bool:
        # PAVENET_WINDOW_ATTN=pallas|xla overrides (the head-level ``impl``
        # token is shared with the deformable sampling op, whose 'pallas'
        # kernels are encoder-geometry-specific — this knob forces just the
        # window-attention implementation, e.g. for CPU interpret-mode
        # verification)
        import os
        env = os.environ.get("PAVENET_WINDOW_ATTN")
        if env in ("pallas", "xla"):
            return env == "pallas"
        if self.impl == "xla":
            return False
        if self.impl == "pallas":
            return True
        return jax.default_backend() == "tpu"

    @nn.compact
    def __call__(self, x, pos, reference_points, spatial_shapes: Shapes,
                 key_padding_mask, deterministic: bool = True):
        from .transformer import FFN
        C, Hn = self.embed_dims, self.num_heads
        D = C // Hn
        B = x.shape[0]
        identity = x

        qk = x + pos if pos is not None else x
        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(qk)
        k = nn.Dense(C, dtype=self.dtype, name="k_proj")(qk)
        v = nn.Dense(C, dtype=self.dtype, name="v_proj")(x)
        if key_padding_mask is not None:
            v = jnp.where(key_padding_mask[..., None], 0.0, v)

        outs = []
        start = 0
        wh, ww = WINDOW
        use_pallas = self._use_pallas()
        for (Hl, Wl) in spatial_shapes:
            n = Hl * Wl
            sl = slice(start, start + n)
            if use_pallas:
                outs.append(_attend_level_pallas(
                    q[:, sl], k[:, sl], v[:, sl],
                    key_padding_mask[:, sl]
                    if key_padding_mask is not None else None,
                    Hl, Wl, Hn, wh, ww, self.shift))
                start += n
                continue
            qw = window_partition(q[:, sl], Hl, Wl, wh, ww, self.shift)
            kw = window_partition(k[:, sl], Hl, Wl, wh, ww, self.shift)
            vw = window_partition(v[:, sl], Hl, Wl, wh, ww, self.shift)
            S = qw.shape[1]
            nW = qw.shape[0]
            if key_padding_mask is not None:
                mw = window_partition(
                    key_padding_mask[:, sl, None].astype(jnp.float32),
                    Hl, Wl, wh, ww, self.shift)[..., 0]
                # window padding itself: partition of ones marks content
                onesw = window_partition(
                    jnp.ones((B, n, 1), jnp.float32), Hl, Wl, wh, ww,
                    self.shift)[..., 0]
                keep = (onesw > 0) & (mw < 0.5)          # (nW, S)
            else:
                keep = (window_partition(
                    jnp.ones((B, n, 1), jnp.float32), Hl, Wl, wh, ww,
                    self.shift)[..., 0] > 0)

            qh = qw.reshape(nW, S, Hn, D).transpose(0, 2, 1, 3)
            kh = kw.reshape(nW, S, Hn, D).transpose(0, 2, 1, 3)
            vh = vw.reshape(nW, S, Hn, D).transpose(0, 2, 1, 3)
            scores = jnp.einsum(
                "whqd,whkd->whqk", qh, kh,
                preferred_element_type=jnp.float32) / jnp.sqrt(
                    jnp.asarray(D, jnp.float32))
            scores = jnp.where(keep[:, None, None, :], scores, -1e9)
            attn = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            ow = jnp.einsum("whqk,whkd->whqd", attn, vh)
            ow = ow.transpose(0, 2, 1, 3).reshape(nW, S, C)
            outs.append(window_unpartition(ow, B, Hl, Wl, wh, ww,
                                           self.shift))
            start += n

        out = nn.Dense(C, dtype=self.dtype, name="out_proj")(
            jnp.concatenate(outs, axis=1))
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(identity + out)
        x = FFN(self.embed_dims, self.feedforward_channels,
                dropout=self.dropout, dtype=self.dtype, name="ffn")(
                    x, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
