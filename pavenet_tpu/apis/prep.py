"""In-jit batch preprocessing shared by the train/eval/distill entry jits.

The on-device-normalize pipelines (``build_test_pipeline`` /
``build_train_pipeline`` with ``normalize_on_device=True``) keep images
uint8 end to end on the host: no float Normalize pass on the 1-vCPU
host, and the host->device image payload crosses the wire at 1/4 the
bytes — on a tunneled chip that transfer dominates both the eval loop
and the prebaked train loop, and the tunnel client leaks the host copy
of every transferred buffer (PERF_NOTES round 5), so smaller payloads
also linearly extend how long a run fits under the RSS guard.

``make_device_prep`` builds the jit-side counterpart: (x - mean) / std
in f32, then re-zero the bucket padding so the result is exactly what
the host Normalize -> Pad chain produces (pad-after-normalize = zeros).
Float batches pass through untouched, so every entry point can apply it
unconditionally.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

IMG_NORM_MEAN = (123.675, 116.28, 103.53)
IMG_NORM_STD = (58.395, 57.12, 57.375)


def make_device_prep(img_norm=(IMG_NORM_MEAN, IMG_NORM_STD)):
    """Return ``prep(feed) -> feed`` normalizing uint8 image batches.

    ``feed['img']``: (B, T, H, W, 3) uint8 (or any float dtype, passed
    through untouched); ``feed['img_shape']``: (B, 2) valid (h, w) per
    sample — everything at or beyond it is bucket padding and is re-zeroed
    after normalization.
    """
    mean, std = img_norm
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def prep(feed):
        img = feed["img"]
        if img.dtype != jnp.uint8:
            return feed
        x = (img.astype(jnp.float32) - mean) / std
        B, T, H, W, _ = x.shape
        shp = feed["img_shape"]
        hs = shp[:, 0].reshape(B, 1, 1, 1, 1)
        ws = shp[:, 1].reshape(B, 1, 1, 1, 1)
        ih = jax.lax.broadcasted_iota(jnp.int32, (1, 1, H, 1, 1), 2)
        iw = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, W, 1), 3)
        x = jnp.where((ih < hs) & (iw < ws), x, 0.0)
        return dict(feed, img=x)

    return prep
