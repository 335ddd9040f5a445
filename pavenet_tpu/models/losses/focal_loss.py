"""Focal losses.

``sigmoid_focal_loss`` matches mmdet's CUDA ``SigmoidFocalLoss`` semantics
(reference ``third_party/mmcv/mmcv/ops/csrc/.../sigmoid_focal_loss`` via
``mmdet.FocalLoss``): per-element focal BCE where ``target`` is a class
index and ``num_classes`` means background.

``center_focal_loss`` is the CornerNet-style penalty-reduced heatmap loss
(reference ``opera/models/losses/center_focal_loss.py:12``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       weight: jnp.ndarray | None = None,
                       gamma: float = 2.0, alpha: float = 0.25,
                       avg_factor: float | jnp.ndarray = 1.0) -> jnp.ndarray:
    """Args: logits (N, C); labels int (N,) in [0, C] (C = background)."""
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    pt = p * onehot + (1 - p) * (1 - onehot)
    focal_weight = (alpha * onehot + (1 - alpha) * (1 - onehot)) * (
        (1 - pt) ** gamma)
    bce = -(onehot * jax.nn.log_sigmoid(logits)
            + (1 - onehot) * jax.nn.log_sigmoid(-logits))
    loss = (bce * focal_weight).sum(-1)
    if weight is not None:
        loss = loss * weight
    return loss.sum() / avg_factor


def center_focal_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                      mask: jnp.ndarray | None = None,
                      eps: float = 1e-4) -> jnp.ndarray:
    """Penalty-reduced pixelwise focal loss on heatmaps.

    pred: (B, H, W, K) sigmoid probabilities clamped to (eps, 1-eps);
    gt: same shape, gaussian-splatted targets (1 at centers);
    mask: (B, H, W) bool, True = valid pixel.
    """
    pred = jnp.clip(pred, eps, 1 - eps)
    pos = (gt == 1).astype(pred.dtype)
    neg_weights = jnp.power(1 - gt, 4)
    pos_loss = jnp.log(pred) * jnp.power(1 - pred, 2) * pos
    neg_loss = jnp.log(1 - pred) * jnp.power(pred, 2) * neg_weights * (1 - pos)
    if mask is not None:
        m = mask[..., None].astype(pred.dtype)
        pos_loss = pos_loss * m
        neg_loss = neg_loss * m
    num_pos = pos.sum()
    total = -(pos_loss.sum() + neg_loss.sum())
    return jnp.where(num_pos > 0, total / jnp.maximum(num_pos, 1.0),
                     -neg_loss.sum())


def varifocal_loss(logits: jnp.ndarray, target_score: jnp.ndarray,
                   gamma: float = 2.0, alpha: float = 0.75,
                   avg_factor: float | jnp.ndarray = 1.0) -> jnp.ndarray:
    """VarifocalLoss (reference: ``mmdet/models/losses/varifocal_loss.py``,
    iou_weighted=True, use_sigmoid=True).

    ``target_score`` is a soft quality score in [0, 1] (InsPose uses the
    OKS of the decoded pose); positives (> 0) are weighted by the score,
    negatives by ``alpha * p^gamma``.
    """
    p = jax.nn.sigmoid(logits)
    t = target_score.astype(logits.dtype)
    pos = (t > 0.0).astype(logits.dtype)
    focal_weight = t * pos + alpha * jnp.abs(p - t) ** gamma * (1.0 - pos)
    bce = -(t * jax.nn.log_sigmoid(logits)
            + (1.0 - t) * jax.nn.log_sigmoid(-logits))
    return (bce * focal_weight).sum() / avg_factor
