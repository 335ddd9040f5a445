"""OKS loss (reference ``opera/models/losses/oks_loss.py``)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _sigmas(num_keypoints: int) -> np.ndarray:
    if num_keypoints == 17:  # COCO
        s = [.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62, 1.07,
             1.07, .87, .87, .89, .89]
    elif num_keypoints == 15:  # PoseTrack
        s = [.26, .79, .79, .79, .79, .72, .72, .62, .62, 1.07, 1.07, .87,
             .87, .89, .89]
    elif num_keypoints == 14:  # CrowdPose
        s = [.79, .79, .72, .72, .62, .62, 1.07, 1.07, .87, .87, .89, .89,
             .79, .79]
    else:
        raise ValueError(f"unsupported num_keypoints {num_keypoints}")
    return np.asarray(s, np.float32) / 10.0


OKS_SIGMAS = {k: _sigmas(k) for k in (14, 15, 17)}


def oks_overlaps(kpt_preds, kpt_gts, kpt_valids, kpt_areas, sigmas):
    """kpt_preds/gts (n, K*2) unnormalized; valids (n, K); areas (n,)."""
    sigmas = jnp.asarray(sigmas, kpt_preds.dtype)
    variances = (sigmas * 2) ** 2
    preds = kpt_preds.reshape(-1, kpt_preds.shape[-1] // 2, 2)
    gts = kpt_gts.reshape(-1, kpt_gts.shape[-1] // 2, 2)
    d2 = ((preds[..., 0] - gts[..., 0]) ** 2
          + (preds[..., 1] - gts[..., 1]) ** 2)
    e = d2 / (kpt_areas[:, None] * variances[None, :] * 2 + 1e-12)
    oks = (jnp.exp(-e) * kpt_valids).sum(-1) / jnp.maximum(
        kpt_valids.sum(-1), 1e-6)
    return oks


def oks_loss(kpt_preds, kpt_gts, kpt_valids, kpt_areas,
             num_keypoints: int = 15, linear: bool = False,
             eps: float = 1e-6, weight=None, avg_factor=1.0):
    """-log(OKS) per instance, weighted + averaged.

    ``weight`` masks out padded instances (rows with no valid keypoints or
    invalid gts).
    """
    oks = jnp.clip(
        oks_overlaps(kpt_preds, kpt_gts, kpt_valids, kpt_areas,
                     OKS_SIGMAS[num_keypoints]), min=eps)
    loss = (1 - oks) if linear else -jnp.log(oks)
    if weight is not None:
        loss = loss * weight
    return loss.sum() / avg_factor
