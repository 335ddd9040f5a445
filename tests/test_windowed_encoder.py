"""Opt-in TPU-mode windowed encoder (models/layers/windowed.py).

Design variant with no reference counterpart — tests cover the
window-partition geometry, padding-mask semantics, and that the full
model trains/infers finitely with ``encoder_mode='windowed'``.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pavenet_tpu.models.layers.windowed import (
    window_partition, window_unpartition, WindowedEncoderLayer)


@pytest.mark.parametrize("shift", [False, True])
@pytest.mark.parametrize("hw", [(9, 17), (8, 16), (3, 5), (1, 2)])
def test_window_partition_roundtrip(hw, shift):
    Hl, Wl = hw
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, Hl * Wl, 5).astype(np.float32))
    w = window_partition(x, Hl, Wl, shift=shift)
    assert w.shape[1] == 8 * 16
    back = window_unpartition(w, 2, Hl, Wl, shift=shift)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_padding_mask_blocks_padded_keys():
    """Padded tokens must receive zero attention weight: outputs over
    content tokens are invariant to the padded tokens' values."""
    Hl, Wl = 8, 16
    rng = np.random.RandomState(1)
    B, C = 1, 16
    layer = WindowedEncoderLayer(embed_dims=C, num_heads=2,
                                 feedforward_channels=32, dropout=0.0)
    x = rng.randn(B, Hl * Wl, C).astype(np.float32)
    pos = rng.randn(B, Hl * Wl, C).astype(np.float32)
    # mask the right half of the raster (bucket padding pattern)
    mask2d = np.zeros((Hl, Wl), bool)
    mask2d[:, Wl // 2:] = True
    mask = jnp.asarray(np.broadcast_to(mask2d.reshape(1, -1),
                                       (B, Hl * Wl)))
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(pos), None, ((Hl, Wl),), mask)
    out1 = layer.apply(variables, jnp.asarray(x), jnp.asarray(pos), None,
                       ((Hl, Wl),), mask)
    x2 = x.copy()
    x2[:, mask2d.reshape(-1)] += rng.randn(int(mask2d.sum()), C) * 10
    out2 = layer.apply(variables, jnp.asarray(x2), jnp.asarray(pos), None,
                       ((Hl, Wl),), mask)
    keep = ~mask2d.reshape(-1)
    np.testing.assert_allclose(np.asarray(out1)[:, keep],
                               np.asarray(out2)[:, keep],
                               atol=1e-5)


def test_windowed_model_trains_and_infers():
    from pavenet_tpu.models.zoo import pavenet_r50_frames3, dummy_clip_batch
    from pavenet_tpu.apis.train import create_train_state, make_train_step

    model = pavenet_r50_frames3(
        backbone_depth=18, embed_dims=32, num_encoder_layers=2,
        num_decoder_layers=1, num_refine_layers=1, num_query=12, max_gt=3,
        feedforward_channels=64, dropout=0.0, max_per_img=6,
        encoder_mode="windowed")
    rng = np.random.RandomState(0)
    batch = dummy_clip_batch(rng, batch_size=1, height=64, width=96,
                             max_gt=3, train=True)
    state, tx = create_train_state(model, batch, seed=0,
                                   tx_kwargs=dict(accumulate_steps=1,
                                                  learning_rate=1e-4))
    step = make_train_step(model, tx, donate=False)
    state, losses = step(state, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # shifted layer params exist (encoder_layer1 uses shift=True)
    assert "encoder_layer1" in state.params["head"]

    infer = dummy_clip_batch(rng, batch_size=1, height=64, width=96,
                             max_gt=3, train=False)
    out = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats}, infer,
                      train=False)
    kpts = np.asarray(out["det_kpts"])
    assert np.isfinite(kpts).all() and kpts.shape[-1] == 3


def test_builder_encoder_mode():
    from pavenet_tpu.models.builder import build_detector
    cfg = dict(
        type="opera.VideoPoseV1",
        backbone=dict(type="mmdet.ResNet", depth=18),
        bbox_head=dict(
            type="opera.VideoPoseHeadMulFrames",
            num_query=12,
            transformer=dict(
                encoder=dict(num_layers=1, mode="windowed",
                             transformerlayers=dict(
                                 attn_cfgs=dict(embed_dims=32))),
                decoder=dict(num_layers=1),
                refine_decoder=dict(num_layers=1))),
        test_cfg=dict(max_per_img=5))
    model = build_detector(cfg)
    assert model.encoder_mode == "windowed"
