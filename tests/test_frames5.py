"""T=5 video path (replaces the reference's separate NumFrames5 classes)."""
import numpy as np
import pytest
import jax

from pavenet_tpu.models.detectors import VideoPoseDetector
from pavenet_tpu.models.zoo import dummy_clip_batch


def test_frames5_train_and_test():
    model = VideoPoseDetector(
        num_frames=5, num_keypoints=15, num_query=10, max_gt=3,
        backbone_depth=18, embed_dims=32, num_encoder_layers=1,
        num_decoder_layers=1, num_refine_layers=1, max_per_img=4,
        feedforward_channels=64)
    rng = np.random.RandomState(0)
    batch = dummy_clip_batch(rng, batch_size=1, num_frames=5, height=64,
                             width=96, num_keypoints=15, max_gt=3,
                             train=True)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True))()
    # 4 aux kpt branch stacks (pre_pre, pre, next, next_next)
    head = variables["params"]["head"]
    aux = [k for k in head if k.startswith("aux_kpt_branch_f")]
    assert len({k.split("_l")[0] for k in aux}) == 4
    refine = [k for k in head if k.startswith("refine_kpt_branch_f")]
    assert len({k.split("_l")[0] for k in refine}) == 5

    losses = jax.jit(lambda v: model.apply(
        v, batch, train=True, rngs={"dropout": jax.random.PRNGKey(2)}))(
            variables)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    out = jax.jit(lambda v: model.apply(v, batch, train=False))(variables)
    assert out["det_kpts"].shape == (1, 4, 15, 3)
