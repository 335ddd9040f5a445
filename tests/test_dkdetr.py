"""DK-DETR (open-vocab SOIT) smoke test: text-embedding classification."""
import numpy as np
import pytest
import jax

from pavenet_tpu.models.detectors.soit import SOITDetector


def test_dkdetr_text_classification():
    model = SOITDetector(
        num_classes=6, num_query=10, max_gt=3, backbone_depth=18,
        embed_dims=32, num_encoder_layers=1, num_decoder_layers=1,
        feedforward_channels=64, max_per_img=4,
        cls_emb_dim=16, temperature=0.5)
    rng = np.random.RandomState(0)
    B, H, W, G = 1, 64, 96, 3
    boxes = np.array([[[5, 5, 40, 40], [20, 10, 70, 50],
                       [0, 0, 30, 30]]], np.float32)
    batch = dict(
        img=rng.randn(B, H, W, 3).astype(np.float32),
        img_shape=np.array([[H, W]], np.int32),
        scale_factor=np.ones((B, 2), np.float32),
        gt_boxes=boxes,
        gt_labels=np.array([[0, 2, 5]], np.int64),
        gt_masks=(rng.rand(B, G, H, W) > 0.5).astype(np.float32),
        gt_valid=np.array([[True, True, False]]),
        text_feats=rng.randn(6, 16).astype(np.float32),
    )
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True))()
    losses = jax.jit(lambda v: model.apply(
        v, batch, train=True, rngs={"dropout": jax.random.PRNGKey(2)}))(
            variables)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    out = jax.jit(lambda v: model.apply(v, batch, train=False))(variables)
    assert out["det_bboxes"].shape == (1, 4, 5)
    assert int(out["det_labels"].max()) < 6


def test_pseudo_text_encoder(tmp_path):
    from pavenet_tpu.models.text_encoder import PseudoTextEncoder
    feats = np.random.RandomState(0).randn(6, 16).astype(np.float32)
    path = tmp_path / "feats.npy"
    np.save(path, feats)
    enc = PseudoTextEncoder(str(path), text_dim=16)
    np.testing.assert_array_equal(enc.get_text_feat(), feats)
