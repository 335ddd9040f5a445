"""Pose Hungarian matching + target construction (jittable, batched).

Rebuilds the reference assignment stack
(``opera/core/bbox/assigners/hungarian_assigner.py:16-149`` +
``opera/core/bbox/match_costs/match_cost.py``) as pure functions over
statically padded GT arrays.  The reference loops per GT in python and ships
the cost matrix to CPU scipy; here costs are vmapped and the assignment runs
in-jit (``pavenet_tpu.ops.lap``), so matching stays on device inside the
train step.

GT encoding (static shapes): ``gt_kpts (G, K, 3)`` unnormalized xyv,
``gt_areas (G,)``, ``gt_valid (G,)`` bool; padded rows have
``gt_valid=False``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.lap import hungarian_masked


def focal_cls_cost(cls_logits, gamma=2.0, alpha=0.25, eps=1e-12,
                   weight=2.0):
    """mmdet FocalLossCost for the single 'person' class.

    cls_logits (Q, 1) -> cost contribution (Q,) (same for every gt).
    """
    p = jax.nn.sigmoid(cls_logits[:, 0])
    neg = -jnp.log(1 - p + eps) * (1 - alpha) * p ** gamma
    pos = -jnp.log(p + eps) * alpha * (1 - p) ** gamma
    return (pos - neg) * weight


def kpt_l1_cost(kpt_pred, gt_kpts_norm, vis, weight=70.0):
    """Visibility-masked L1 (reference ``match_cost.py:12-56``).

    kpt_pred (Q, K, 2) normalized; gt_kpts_norm (G, K, 2); vis (G, K).
    Returns (Q, G).
    """
    # predictions at invisible gt joints are zeroed; the reference compares
    # that masked prediction against the raw gt vector (constant-per-column
    # terms from invisible joints don't affect the matching).
    visf = (vis > 0).astype(kpt_pred.dtype)
    pred = kpt_pred[:, None] * visf[None, :, :, None]         # (Q,G,K,2)
    cost = jnp.abs(pred - gt_kpts_norm[None]).sum((-1, -2))   # (Q, G)
    avg = jnp.maximum(visf.sum(-1) * 2.0, 1.0)                # (G,)
    return cost / avg[None, :] * weight


def oks_cost(kpt_pred_abs, gt_kpts_abs, vis, areas, num_keypoints=15,
             weight=7.0):
    """-OKS cost (reference ``match_cost.py:170-256``).

    kpt_pred_abs (Q, K, 2); gt_kpts_abs (G, K, 2); vis (G, K);
    areas (G,). Returns (Q, G).
    """
    from ..models.losses.oks_loss import OKS_SIGMAS
    sigmas = jnp.asarray(OKS_SIGMAS[num_keypoints])
    variances = (sigmas * 2) ** 2
    d2 = ((kpt_pred_abs[:, None, :, 0] - gt_kpts_abs[None, :, :, 0]) ** 2
          + (kpt_pred_abs[:, None, :, 1] - gt_kpts_abs[None, :, :, 1]) ** 2)
    e = d2 / (jnp.maximum(areas[None, :, None], 1e-6)
              * variances[None, None, :] * 2)
    visf = (vis > 0).astype(e.dtype)
    oks = (jnp.exp(-e) * visf[None]).sum(-1) / jnp.maximum(
        visf.sum(-1)[None], 1.0)
    return -oks * weight


def rle_cost(kpt_pred, sigma_pred, gt_kpts_norm, vis, log_prob_fn,
             weight: float = 1.0):
    """RLE-based matching cost (reference experimental ``RLECost``,
    ``opera/core/bbox/match_costs/match_cost.py:60``): per (query, gt)
    summed RLE loss over joints, visibility-masked, divided by the number
    of joints then by 2*num_vis.

    kpt_pred (Q, K, 2); sigma_pred (Q, K, 2); gt_kpts_norm (G, K, 2);
    vis (G, K); log_prob_fn: flow log-prob over (..., 2).  Returns (Q, G).
    """
    import math
    Q, K = kpt_pred.shape[:2]
    amp = 1.0 / math.sqrt(2 * math.pi)
    sigma = jnp.clip(sigma_pred, 1e-9, None)

    def per_gt(gt, v):
        bar_mu = (kpt_pred - gt[None]) / sigma            # (Q, K, 2)
        log_phi = jax.lax.stop_gradient(
            log_prob_fn(bar_mu.reshape(-1, 2))).reshape(Q, K, 1)
        nf = (jnp.log(sigma) - log_phi) * v[None, :, None]
        q = (jnp.log(sigma / amp)
             + jnp.abs(gt[None] - kpt_pred) / (math.sqrt(2) * sigma + 1e-9)
             ) * v[None, :, None]
        cost = (nf + q).sum((1, 2)) / K                   # (Q,)
        return cost / jnp.maximum(v.sum() * 2.0, 1.0)

    visf = (vis > 0).astype(kpt_pred.dtype)
    return jax.vmap(per_gt, in_axes=(0, 0), out_axes=1)(
        gt_kpts_norm, visf) * weight


class AssignResult(NamedTuple):
    """Per-image one-to-one matching over padded GT slots."""
    query_idx: jnp.ndarray   # (G,) int32, matched query per gt (-1 invalid)
    valid: jnp.ndarray       # (G,) bool


def pose_match_cost(cls_logits, kpt_pred, gt_kpts, gt_areas, img_shape,
                    num_keypoints=15, cls_weight=2.0, kpt_weight=70.0,
                    oks_weight=7.0) -> jnp.ndarray:
    """(Q, G) matching cost = focal + kpt-L1 + (-OKS), the reference
    ``PoseHungarianAssigner.assign`` cost (``hungarian_assigner.py:47``)."""
    h = img_shape[0].astype(kpt_pred.dtype)
    w = img_shape[1].astype(kpt_pred.dtype)
    factor = jnp.stack([w, h])
    gt_xy = gt_kpts[..., :2]
    vis = gt_kpts[..., 2]
    gt_norm = gt_xy / factor

    cost = focal_cls_cost(cls_logits, weight=cls_weight)[:, None]
    cost = cost + kpt_l1_cost(kpt_pred, gt_norm, vis, weight=kpt_weight)
    cost = cost + oks_cost(kpt_pred * factor, gt_xy, vis, gt_areas,
                           num_keypoints, weight=oks_weight)
    return jnp.where(jnp.isfinite(cost), cost, 1e4)


def pose_hungarian_assign(cls_logits, kpt_pred, gt_kpts, gt_areas, gt_valid,
                          img_shape, num_keypoints=15,
                          cls_weight=2.0, kpt_weight=70.0, oks_weight=7.0
                          ) -> AssignResult:
    """Single-image assignment. kpt_pred (Q, K, 2) normalized [0,1];
    gt_kpts (G, K, 3) unnormalized; img_shape (2,) = (h, w)."""
    cost = pose_match_cost(cls_logits, kpt_pred, gt_kpts, gt_areas,
                           img_shape, num_keypoints, cls_weight,
                           kpt_weight, oks_weight)
    query_idx = hungarian_masked(
        jax.lax.stop_gradient(cost).T, gt_valid)
    return AssignResult(query_idx=query_idx, valid=gt_valid)


class PoseTargets(NamedTuple):
    labels: jnp.ndarray        # (Q,) int32 class index (num_classes = bg)
    kpt_targets: jnp.ndarray   # (G, K, 2) normalized gt xy
    kpt_weights: jnp.ndarray   # (G, K, 2) visibility * validity
    area_targets: jnp.ndarray  # (G,)
    query_idx: jnp.ndarray     # (G,) matched query per gt (-1 = invalid)
    num_pos: jnp.ndarray       # scalar


def build_pose_targets(assign: AssignResult, gt_kpts, gt_areas, img_shape,
                       num_query: int, num_classes: int = 1) -> PoseTargets:
    """Build per-image training targets from an assignment.

    Positive (matched) supervision is expressed per-GT-slot (gather form:
    the caller gathers predictions at ``query_idx``); classification labels
    are scattered per query.
    """
    h = img_shape[0].astype(jnp.float32)
    w = img_shape[1].astype(jnp.float32)
    factor = jnp.stack([w, h])
    vis = (gt_kpts[..., 2] > 0).astype(jnp.float32)
    kpt_targets = gt_kpts[..., :2] / factor
    kpt_weights = (vis * assign.valid[:, None].astype(jnp.float32)
                   )[..., None] * jnp.ones((1, 1, 2))

    labels = jnp.full((num_query,), num_classes, jnp.int32)
    safe_idx = jnp.where(assign.valid, assign.query_idx, num_query)
    labels = labels.at[safe_idx].set(0, mode="drop")
    return PoseTargets(
        labels=labels,
        kpt_targets=kpt_targets,
        kpt_weights=kpt_weights,
        area_targets=gt_areas,
        query_idx=assign.query_idx,
        num_pos=assign.valid.sum().astype(jnp.float32),
    )
