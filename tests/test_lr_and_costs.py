"""lr-schedule policies (mmcv lr_updater semantics) + RLECost."""
import numpy as np
import jax
import jax.numpy as jnp

from pavenet_tpu.apis.train import build_lr_schedule
from pavenet_tpu.core.assigner import rle_cost


def test_step_schedule():
    s = build_lr_schedule(dict(policy="step", step=[2], gamma=0.1),
                          1.0, steps_per_epoch=10)
    assert float(s(0)) == 1.0
    assert float(s(19)) == 1.0
    assert abs(float(s(20)) - 0.1) < 1e-6


def test_linear_warmup_then_step():
    s = build_lr_schedule(
        dict(policy="step", step=[1], warmup="linear",
             warmup_iters=10, warmup_ratio=0.1),
        1.0, steps_per_epoch=100)
    # mmcv: factor(k) = 1 - (1 - k/N)(1 - ratio)
    assert abs(float(s(0)) - 0.1) < 1e-6
    assert abs(float(s(5)) - (1 - 0.5 * 0.9)) < 1e-6
    assert abs(float(s(10)) - 1.0) < 1e-6


def test_cosine_schedule():
    s = build_lr_schedule(dict(policy="cosine", min_lr_ratio=0.1),
                          1.0, steps_per_epoch=10, max_epochs=10)
    assert abs(float(s(0)) - 1.0) < 1e-6
    assert abs(float(s(100)) - 0.1) < 1e-6
    assert abs(float(s(50)) - 0.55) < 1e-6  # halfway: mean of ends


def test_rle_cost_prefers_matching_query():
    from pavenet_tpu.models.flows.realnvp import RealNVP

    flow = RealNVP()
    params = flow.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)),
                       method="log_prob")
    log_prob = lambda x: flow.apply(params, x, method="log_prob")

    rng = np.random.RandomState(0)
    K = 15
    gt = rng.rand(2, K, 2).astype(np.float32)
    pred = np.stack([gt[0], rng.rand(K, 2).astype(np.float32)], 0)
    sigma = np.full((2, K, 2), 0.1, np.float32)
    vis = np.ones((2, K), np.float32)
    cost = np.asarray(rle_cost(jnp.asarray(pred), jnp.asarray(sigma),
                               jnp.asarray(gt), jnp.asarray(vis), log_prob))
    assert cost.shape == (2, 2)
    assert np.isfinite(cost).all()
    # query 0 == gt 0 exactly -> cheapest pairing
    assert cost[0, 0] < cost[1, 0]
