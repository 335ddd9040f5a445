"""Device-side OKS-NMS.

The reference runs greedy OKS-NMS on host numpy at the end of inference
(``opera/models/dense_heads/videopose_head_mul_frames.py:1624-1678``,
threshold 0.45, PoseTrack sigmas / 10).  With ``max_per_img`` small (20 in
the production config) the greedy suppression is cheap, so here it stays on
device as a masked ``fori_loop`` over candidates — no host round trip, and
the result is a static-shape keep mask usable inside jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def oks_iou_matrix(kpts: jnp.ndarray, areas: jnp.ndarray,
                   sigmas: jnp.ndarray) -> jnp.ndarray:
    """Pairwise OKS between poses.

    Matches the reference ``oks_iou`` math
    (``videopose_head_mul_frames.py:1648-1665``): per-keypoint gaussian with
    variance ``(2*sigma)**2``, normalized by the mean of the two areas, all
    K keypoints counted (no visibility gating, as in the production path).

    Args:
        kpts: ``(N, K, 2)`` xy keypoints.
        areas: ``(N,)`` pose areas (bbox of keypoints in the reference).
        sigmas: ``(K,)`` per-keypoint sigmas.

    Returns:
        ``(N, N)`` OKS matrix.
    """
    variances = (sigmas * 2.0) ** 2  # (K,)
    d2 = jnp.sum(
        (kpts[:, None, :, :] - kpts[None, :, :, :]) ** 2, axis=-1)  # (N,N,K)
    mean_area = (areas[:, None] + areas[None, :]) / 2.0 + 1e-16
    e = d2 / variances[None, None, :] / mean_area[..., None] / 2.0
    return jnp.mean(jnp.exp(-e), axis=-1)


def oks_nms_keep(kpts: jnp.ndarray, scores: jnp.ndarray, areas: jnp.ndarray,
                 sigmas: jnp.ndarray, thresh: float = 0.45,
                 score_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Greedy OKS-NMS; returns a bool keep mask of shape ``(N,)``.

    Candidates are visited in descending score order; a candidate is kept iff
    no higher-scoring kept pose overlaps it with OKS > ``thresh``.
    """
    kpts = jnp.asarray(kpts)
    scores = jnp.asarray(scores)
    areas = jnp.asarray(areas)
    sigmas = jnp.asarray(sigmas)
    N = scores.shape[0]
    if score_valid is not None:
        scores = jnp.where(score_valid, scores, -jnp.inf)
    order = jnp.argsort(-scores)
    oks = oks_iou_matrix(kpts, areas, sigmas)

    def body(step, keep):
        i = order[step]
        valid = jnp.isfinite(scores[i])
        # suppressed if any earlier-kept (higher-ranked) pose overlaps it
        rank = jnp.zeros((N,), jnp.int32).at[order].set(jnp.arange(N))
        earlier_kept = keep & (rank < rank[i])
        suppressed = jnp.any(earlier_kept & (oks[i] > thresh))
        return keep.at[i].set(valid & ~suppressed)

    keep = jax.lax.fori_loop(0, N, body, jnp.zeros((N,), bool))
    return keep
