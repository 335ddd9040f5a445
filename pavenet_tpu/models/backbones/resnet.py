"""ResNet backbone (flax, NHWC).

Rebuilds the torchvision-style ResNet used by the reference
(``third_party/mmdetection/mmdet/models/backbones/resnet.py``; 'pytorch'
style: stride in the 3x3 conv).  The pose production configs freeze all
BatchNorms (``norm_cfg requires_grad=False, norm_eval=True``), so
normalization is a frozen affine transform using stored statistics —
implemented as ``FrozenBatchNorm`` whose statistics live in the
``batch_stats`` collection and are only ever written by the PyTorch weight
converter or random init.

``norm_eval=False`` (DK-DETR: ``configs/dk-detr/dkd_r50_70e_lvis.py:14``
``SyncBN requires_grad=True, norm_eval=False``) switches the norms to
trainable BatchNorm computing batch statistics at train time — except in
the stem and stages <= ``frozen_stages`` (mmdet ``_freeze_stages`` keeps
those BN in eval mode regardless of ``norm_eval``; every reference config
uses frozen_stages=1).  Under a
``pjit``-sharded data-parallel step the batch axis is a *logical* axis, so
the reduction automatically spans every device — XLA's GSPMD inserts the
cross-chip collective, which is exactly SyncBN (the reference needed an
explicit ``SyncBN`` module over NCCL).  Running statistics follow torch
semantics (momentum 0.1 -> flax 0.9, eps 1e-5); torch's unbiased
running-var update vs flax's biased one differs by N/(N-1), negligible at
training batch sizes and irrelevant to converted (already-trained) stats.

Multi-frame input (reference ``resnet.py:634-640``, ``input_type=
'mul_frames'``) is handled by the caller folding ``(B, T, H, W, 3)`` to
``(B*T, H, W, 3)``; the backbone itself is frame-agnostic.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class FrozenBatchNorm(nn.Module):
    """BatchNorm evaluated with frozen statistics and affine params."""
    features: int
    dtype: jnp.dtype = jnp.float32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             nn.initializers.zeros, None, (self.features,))
        var = self.variable("batch_stats", "var",
                            nn.initializers.ones, None, (self.features,))
        inv = jnp.asarray(
            scale / jnp.sqrt(var.value + self.eps), self.dtype)
        b = jnp.asarray(bias - mean.value * scale /
                        jnp.sqrt(var.value + self.eps), self.dtype)
        return x * inv + b


def _make_norm(features, norm_eval, train, dtype, name):
    """FrozenBatchNorm (norm_eval=True) or trainable BatchNorm.

    Both store affine params as ``scale``/``bias`` and statistics as
    ``batch_stats/{mean,var}``, so converted reference weights load into
    either without remapping."""
    if norm_eval:
        return FrozenBatchNorm(features, dtype, name=name)
    bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                      epsilon=1e-5, dtype=dtype, name=name)
    return bn


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dilation: int = 1
    norm_eval: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # noqa: D401
        def norm(feat, name):
            return _make_norm(feat, self.norm_eval, train, self.dtype, name)

        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = norm(self.planes, "bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=[(self.dilation,) * 2] * 2,
                      kernel_dilation=(self.dilation,) * 2, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = norm(self.planes, "bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = norm(self.planes * 4, "bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = norm(self.planes * 4, "downsample_bn")(identity)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dilation: int = 1
    norm_eval: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def norm(feat, name):
            return _make_norm(feat, self.norm_eval, train, self.dtype, name)

        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=[(1, 1)] * 2, use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = norm(self.planes, "bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=[(1, 1)] * 2,
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = norm(self.planes, "bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = norm(self.planes, "downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """ResNet-{18,34,50,101,152} with mmdet-style stage outputs.

    ``out_indices`` index stages 0..3 (C2..C5). Production PAVE-Net uses
    depth=50, out_indices=(1, 2, 3) -> C3, C4, C5.
    """
    depth: int = 50
    out_indices: Tuple[int, ...] = (1, 2, 3)
    norm_eval: bool = True
    frozen_stages: int = 1   # stem + stages <= this keep eval-mode BN
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_name, stage_blocks = ARCH_SETTINGS[self.depth]
        block_cls = Bottleneck if block_name == "bottleneck" else BasicBlock

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        stem_eval = self.norm_eval or self.frozen_stages >= 0
        x = _make_norm(64, stem_eval, train, self.dtype, "bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1)
        x = nn.max_pool(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                                constant_values=-jnp.inf),
                        (3, 3), strides=(2, 2))

        outs = []
        planes = 64
        expansion = 4 if block_name == "bottleneck" else 1
        in_channels = 64
        for stage, num_blocks in enumerate(stage_blocks):
            stride = 1 if stage == 0 else 2
            for i in range(num_blocks):
                blk_stride = stride if i == 0 else 1
                needs_ds = (blk_stride != 1
                            or in_channels != planes * expansion)
                x = block_cls(
                    planes=planes,
                    stride=blk_stride,
                    downsample=(i == 0 and needs_ds),
                    norm_eval=(self.norm_eval
                               or stage + 1 <= self.frozen_stages),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}")(x, train=train)
                in_channels = planes * expansion
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
