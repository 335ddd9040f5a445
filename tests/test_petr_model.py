"""PETR (single-frame, L1+OKS+heatmap) smoke tests."""
import numpy as np
import pytest
import jax

from pavenet_tpu.models.zoo import petr_r50_coco, dummy_clip_batch


@pytest.fixture(scope="module")
def petr_setup():
    model = petr_r50_coco(
        backbone_depth=18, embed_dims=32, num_encoder_layers=1,
        num_decoder_layers=2, num_refine_layers=1, num_query=12,
        max_gt=4, max_per_img=5, feedforward_channels=64)
    rng = np.random.RandomState(0)
    batch = dummy_clip_batch(rng, batch_size=1, num_frames=1, height=64,
                             width=96, num_keypoints=17, max_gt=4,
                             train=True)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True))()
    return model, variables, batch


def test_petr_train_losses(petr_setup):
    model, variables, batch = petr_setup
    losses = jax.jit(lambda v: model.apply(
        v, batch, train=True, rngs={"dropout": jax.random.PRNGKey(2)}))(
            variables)
    expected = {"loss", "loss_cls", "loss_kpt", "loss_oks", "enc_loss_kpt",
                "loss_hm", "d0.loss_kpt_refine", "d0.loss_oks_refine"}
    assert expected <= set(losses), sorted(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_petr_inference(petr_setup):
    model, variables, batch = petr_setup
    out = jax.jit(lambda v: model.apply(v, batch, train=False))(variables)
    assert out["det_kpts"].shape == (1, 5, 17, 3)
    # PETR: no NMS (all kept), unit keypoint scores
    assert bool(out["keep"].all())
    np.testing.assert_allclose(np.asarray(out["det_kpts"][..., 2]), 1.0)
