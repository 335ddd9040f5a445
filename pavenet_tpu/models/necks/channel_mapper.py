"""ChannelMapper neck (reference: mmdet ``ChannelMapper``).

1x1 conv + GroupNorm(32) per input level, plus extra 3x3/stride-2 conv +
GN levels appended from the last input until ``num_outs`` levels exist
(production config: 3 inputs -> 4 outputs).  No activation
(``act_cfg=None``).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ChannelMapper(nn.Module):
    out_channels: int = 256
    num_outs: int = 4
    num_groups: int = 32
    kernel_size: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        pad = self.kernel_size // 2
        outs = []
        for i, x in enumerate(inputs):
            y = nn.Conv(self.out_channels,
                        (self.kernel_size, self.kernel_size),
                        padding=[(pad, pad)] * 2, use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            y = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5,
                             dtype=self.dtype,
                             name=f"gn{i}")(y)
            outs.append(y)
        x = inputs[-1]
        for j in range(self.num_outs - len(outs)):
            x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=[(1, 1)] * 2, use_bias=False,
                        dtype=self.dtype, name=f"extra_conv{j}")(x)
            x = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5,
                             dtype=self.dtype,
                             name=f"extra_gn{j}")(x)
            outs.append(x)
        return tuple(outs)
