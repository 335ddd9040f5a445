"""HRNet backbone (flax, NHWC).

Rebuilds mmdet's ``HRNet`` (``third_party/mmdetection/mmdet/models/
backbones/hrnet.py``) as used by PETR-HRNet-W48
(``configs/petr/petr_hrnetw48_16x2_100e_coco.py``): stem (two stride-2
3x3 convs), a Bottleneck stage-1, then multi-resolution stages of
BasicBlock branches with full cross-resolution fusion after every module
(1x1 conv + nearest upsample for low->high, chains of stride-2 3x3 convs
for high->low).  Outputs all branch maps (``multiscale_output=True``);
PETR's neck consumes the last three (96/192/384 for W48).

BatchNorm is frozen-statistics (norm_eval + frozen affine), as with the
ResNet backbone.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import FrozenBatchNorm, BasicBlock, Bottleneck

# (block, num_modules, num_blocks, channels) per stage; W48 from the PETR
# config; W32 as the common mmpose variant
HRNET_EXTRA = {
    48: (
        ("bottleneck", 1, (4,), (64,)),
        ("basic", 1, (4, 4), (48, 96)),
        ("basic", 4, (4, 4, 4), (48, 96, 192)),
        ("basic", 3, (4, 4, 4, 4), (48, 96, 192, 384)),
    ),
    32: (
        ("bottleneck", 1, (4,), (64,)),
        ("basic", 1, (4, 4), (32, 64)),
        ("basic", 4, (4, 4, 4), (32, 64, 128)),
        ("basic", 3, (4, 4, 4, 4), (32, 64, 128, 256)),
    ),
}


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel,) * 2,
                    strides=(self.stride,) * 2,
                    padding=[(pad, pad)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = FrozenBatchNorm(self.features, self.dtype, name="bn")(x)
        return nn.relu(x) if self.relu else x


class HRModule(nn.Module):
    """num_branches parallel block stacks + full fusion."""
    channels: Tuple[int, ...]
    num_blocks: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs):
        n = len(self.channels)
        ys = []
        for b, x in enumerate(xs):
            for k in range(self.num_blocks[b]):
                x = BasicBlock(self.channels[b], dtype=self.dtype,
                               name=f"branch{b}_block{k}")(x)
            ys.append(x)

        if n == 1:
            return ys
        outs = []
        for i in range(n):  # target resolution
            acc = None
            for j in range(n):  # source branch
                y = ys[j]
                if j > i:
                    # low->high: 1x1 conv+BN then nearest upsample 2^(j-i)
                    y = nn.Conv(self.channels[i], (1, 1), use_bias=False,
                                dtype=self.dtype,
                                name=f"fuse{i}_{j}_conv")(y)
                    y = FrozenBatchNorm(self.channels[i], self.dtype,
                                        name=f"fuse{i}_{j}_bn")(y)
                    s = 2 ** (j - i)
                    y = jnp.repeat(jnp.repeat(y, s, axis=1), s, axis=2)
                    y = y[:, :ys[i].shape[1], :ys[i].shape[2]]
                elif j < i:
                    # high->low: (i-j) stride-2 3x3 convs; relu between,
                    # none after the last (mmdet fuse_layers)
                    for t in range(i - j):
                        last = t == i - j - 1
                        y = _ConvBN(
                            self.channels[i] if last else self.channels[j],
                            kernel=3, stride=2, relu=not last,
                            dtype=self.dtype,
                            name=f"fuse{i}_{j}_down{t}")(y)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class HRNet(nn.Module):
    """width 48 (PETR) or 32; returns all 4 branch maps at strides
    4/8/16/32 relative... (4, 8, 16, 32 of the input /4 stem)."""
    width: int = 48
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        extra = HRNET_EXTRA[self.width]
        x = _ConvBN(64, 3, 2, dtype=self.dtype, name="stem1")(x)
        x = _ConvBN(64, 3, 2, dtype=self.dtype, name="stem2")(x)

        # stage 1: Bottleneck x4 at 64 planes (out 256)
        _, _, (n1,), (c1,) = extra[0]
        for k in range(n1):
            x = Bottleneck(c1, downsample=(k == 0), dtype=self.dtype,
                           name=f"layer1_{k}")(x)

        xs = [x]
        prev_channels = (c1 * 4,)
        for s, (_, num_modules, num_blocks, channels) in enumerate(
                extra[1:], start=2):
            # transition: adapt existing branches + spawn the new one
            new_xs = []
            for b, c in enumerate(channels):
                if b < len(prev_channels):
                    if prev_channels[b] != c:
                        new_xs.append(_ConvBN(
                            c, 3, 1, dtype=self.dtype,
                            name=f"transition{s - 1}_{b}")(xs[b]))
                    else:
                        new_xs.append(xs[b])
                else:
                    # new lowest-resolution branch from the previous last
                    new_xs.append(_ConvBN(
                        c, 3, 2, dtype=self.dtype,
                        name=f"transition{s - 1}_{b}")(xs[-1]))
            xs = new_xs
            for m in range(num_modules):
                xs = HRModule(tuple(channels), tuple(num_blocks),
                              dtype=self.dtype,
                              name=f"stage{s}_module{m}")(xs)
            prev_channels = tuple(channels)
        return tuple(xs)
