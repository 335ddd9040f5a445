"""ResNet backbone (flax, NHWC).

Rebuilds the torchvision-style ResNet used by the reference
(``third_party/mmdetection/mmdet/models/backbones/resnet.py``; 'pytorch'
style: stride in the 3x3 conv).  The production configs freeze all BatchNorms
(``norm_cfg requires_grad=False, norm_eval=True``), so normalization is a
frozen affine transform using stored statistics — implemented here as
``FrozenBatchNorm`` whose statistics live in the ``batch_stats`` collection
and are only ever written by the PyTorch weight converter or random init.

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


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=[(self.dilation,) * 2] * 2,
                      kernel_dilation=(self.dilation,) * 2, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, self.dtype, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = FrozenBatchNorm(self.planes * 4, self.dtype,
                                       name="downsample_bn")(identity)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=[(1, 1)] * 2, use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=[(1, 1)] * 2,
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, self.dtype, name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = FrozenBatchNorm(self.planes, self.dtype,
                                       name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """ResNet-{18,34,50,101,152} with mmdet-style stage outputs.

    ``out_indices`` index stages 0..3 (C2..C5). Production PAVE-Net uses
    depth=50, out_indices=(1, 2, 3) -> C3, C4, C5.
    """
    depth: int = 50
    out_indices: Tuple[int, ...] = (1, 2, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        block_name, stage_blocks = ARCH_SETTINGS[self.depth]
        block_cls = Bottleneck if block_name == "bottleneck" else BasicBlock

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, self.dtype, name="bn1")(x)
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
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}")(x)
                in_channels = planes * expansion
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
