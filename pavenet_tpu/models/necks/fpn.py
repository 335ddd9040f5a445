"""FPN neck (reference: mmdet ``FPN``, as configured by InsPose —
``configs/inspose/inspose_r50_8x4_3x_coco.py:17-24``: start_level=1,
num_outs=5, add_extra_convs='on_output', relu_before_extra_convs=True).

Structure (mmdet ``mmdet/models/necks/fpn.py``): 1x1 lateral convs (bias,
no norm) on the selected backbone levels, nearest x2 top-down summation,
3x3 output convs per level, then extra stride-2 3x3 convs stacked on the
LAST OUTPUT (P5 -> P6; P7 = conv(relu(P6)) when relu_before_extra_convs).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample2x_nearest(x: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor x2 (mmdet F.interpolate(scale_factor=2)), cropped
    to the target level's spatial shape (odd sizes round up under x2)."""
    B, h, w, C = x.shape
    y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return y[:, : like.shape[1], : like.shape[2]]


class FPN(nn.Module):
    out_channels: int = 256
    start_level: int = 1
    num_outs: int = 5
    add_extra_convs: str = "on_output"
    relu_before_extra_convs: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        used = list(inputs[self.start_level:])
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(x)
            for i, x in enumerate(used)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample2x_nearest(
                laterals[i], laterals[i - 1])
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name=f"fpn{i}")(laterals[i])
            for i in range(len(laterals))
        ]
        assert self.add_extra_convs == "on_output"
        for j in range(self.num_outs - len(outs)):
            x = outs[-1]
            if j > 0 and self.relu_before_extra_convs:
                x = nn.relu(x)
            outs.append(
                nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=[(1, 1)] * 2, dtype=self.dtype,
                        name=f"fpn_extra{j}")(x))
        return tuple(outs)
