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


def box_iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of ``(N, 4)`` xyxy boxes."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def box_nms_keep(boxes: jnp.ndarray, scores: jnp.ndarray,
                 iou_thr: float = 0.7, score_thr: float = 0.0
                 ) -> jnp.ndarray:
    """Greedy box NMS keep mask (the single-class case of mmdet's
    ``multiclass_nms``/``batched_nms``, ``mmdet/core/post_processing/
    bbox_nms.py:8`` — used by the reference ``aug_test`` merge,
    ``videoposev1.py:246``, and InsPose inference).  Candidates below
    ``score_thr`` are dropped outright."""
    scores = jnp.where(scores > score_thr, scores, -jnp.inf)
    N = scores.shape[0]
    order = jnp.argsort(-scores)
    iou = box_iou_matrix(boxes)

    def body(step, keep):
        i = order[step]
        valid = jnp.isfinite(scores[i])
        rank = jnp.zeros((N,), jnp.int32).at[order].set(jnp.arange(N))
        earlier_kept = keep & (rank < rank[i])
        suppressed = jnp.any(earlier_kept & (iou[i] > iou_thr))
        return keep.at[i].set(valid & ~suppressed)

    return jax.lax.fori_loop(0, N, body, jnp.zeros((N,), bool))


def soft_nms_scores(boxes: jnp.ndarray, scores: jnp.ndarray,
                    iou_thr: float = 0.3) -> jnp.ndarray:
    """Linear soft-NMS: returns decayed scores (mmcv ``soft_nms`` with
    ``method='linear'`` — InsPose test cfg ``soft_nms, iou_threshold=0.3``,
    ``configs/inspose/inspose_r50_8x4_3x_coco.py:62``).

    Each greedy round picks the highest remaining score and decays every
    unprocessed overlap by ``(1 - iou)`` when ``iou > iou_thr``."""
    N = scores.shape[0]
    iou = box_iou_matrix(boxes)

    def body(_, state):
        cur, processed = state
        masked = jnp.where(processed, -jnp.inf, cur)
        i = jnp.argmax(masked)
        valid = jnp.isfinite(masked[i])
        decay = jnp.where(iou[i] > iou_thr, 1.0 - iou[i], 1.0)
        decay = jnp.where(valid, decay, 1.0)
        sel = jnp.arange(N) == i
        cur = jnp.where(processed | sel, cur, cur * decay)
        return cur, processed | sel

    out, _ = jax.lax.fori_loop(0, N, body,
                               (scores, jnp.zeros((N,), bool)))
    return out
