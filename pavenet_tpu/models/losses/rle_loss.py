"""Residual Log-likelihood Estimation loss.

Reference ``opera/models/losses/oks_loss.py:164-194`` (class ``RLELoss``):

    loss = (log(sigma) - log_phi) * w[..., :1]        # flow term
         + (log(sigma / amp) + |gt - mu| / (sqrt(2) sigma)) * w   # Laplace Q
    reduced by sum / num_valid

where ``log_phi = flow.log_prob((mu - gt) / sigma)`` is supplied by the
caller (the flow lives in the head; see
``videopose_head_mul_frames.py:1012-1035``).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

_AMP = 1.0 / math.sqrt(2 * math.pi)


def rle_loss(pred, sigma, target, target_weight, log_phi, num_valid,
             loss_weight: float = 1.0):
    """All of pred/sigma/target/target_weight are (..., K, 2);
    log_phi is (..., K) from the flow; num_valid a scalar."""
    nf_loss = jnp.log(sigma) - log_phi[..., None]
    nf_loss = nf_loss * target_weight[..., :1]
    q_logprob = (jnp.log(sigma / _AMP)
                 + jnp.abs(target - pred) / (math.sqrt(2) * sigma + 1e-9))
    q_logprob = q_logprob * target_weight
    loss = nf_loss + q_logprob
    return loss.sum() / num_valid * loss_weight
