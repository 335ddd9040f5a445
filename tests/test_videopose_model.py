"""End-to-end smoke tests for the flagship video pose detector."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pavenet_tpu.models.detectors import VideoPoseDetector


def tiny_model(num_frames=3):
    return VideoPoseDetector(
        num_frames=num_frames,
        num_keypoints=15,
        num_query=12,
        max_gt=4,
        backbone_depth=18,
        embed_dims=32,
        num_encoder_layers=1,
        num_decoder_layers=2,
        num_refine_layers=1,
        max_per_img=5,
    )


def tiny_batch(rng, B=2, T=3, H=64, W=96, K=15, G=4, train=True):
    batch = {
        "img": rng.randn(B, T, H, W, 3).astype(np.float32),
        "img_shape": np.array([[H, W - 16]] * B, np.int32),
        "scale_factor": np.ones((B, 2), np.float32),
    }
    if train:
        kpts = rng.rand(B, G, K, 3).astype(np.float32)
        kpts[..., 0] *= W - 16
        kpts[..., 1] *= H
        kpts[..., 2] = (kpts[..., 2] > 0.3).astype(np.float32)
        # ensure every valid gt has at least one visible keypoint
        kpts[..., 0, 2] = 1.0
        batch.update(
            gt_keypoints=kpts,
            gt_areas=rng.rand(B, G).astype(np.float32) * 400 + 50,
            gt_valid=np.tile(
                np.array([True, True, False, False][:G]), (B, 1)),
        )
    return batch


@pytest.fixture(scope="module")
def model_and_params():
    rng = np.random.RandomState(0)
    model = tiny_model()
    batch = tiny_batch(rng, train=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=True)
    return model, variables, batch


def test_forward_train_losses(model_and_params):
    model, variables, batch = model_and_params
    losses = model.apply(variables, batch, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)})
    expected = {"loss", "loss_cls", "loss_kpt", "d0.loss_cls", "d0.loss_kpt",
                "enc_loss_cls", "enc_loss_kpt", "d0.loss_kpt_refine"}
    assert expected <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite: {v}"


def test_forward_test_shapes(model_and_params):
    model, variables, _ = model_and_params
    rng = np.random.RandomState(1)
    batch = tiny_batch(rng, train=False)
    out = model.apply(variables, batch, train=False)
    B, M, K = 2, 5, 15
    assert out["det_kpts"].shape == (B, M, K, 3)
    assert out["det_bboxes"].shape == (B, M, 5)
    assert out["keep"].shape == (B, M)
    assert np.isfinite(np.asarray(out["det_kpts"])).all()


def test_grads_flow(model_and_params):
    model, variables, batch = model_and_params

    def loss_fn(params):
        losses = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
        return losses["loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # at least the decoder cross-attn and flows must receive gradient
    gnorm = sum(float(jnp.abs(g).sum()) for g in flat)
    assert gnorm > 0


def test_videopose_v2_freezes_backbone_and_neck():
    """VideoPoseV2 = V1 trained with backbone+neck under no_grad
    (reference ``opera/models/detectors/videoposev2.py:56-60``): the
    builder sets the freeze flag and the optimizer excludes those params."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from pavenet_tpu.models.builder import build_detector
    from pavenet_tpu.models.zoo import dummy_clip_batch
    from pavenet_tpu.apis.train import create_train_state, make_train_step

    model = build_detector(dict(
        type="opera.VideoPoseV2",
        backbone=dict(type="mmdet.ResNet", depth=18),
        bbox_head=dict(
            num_query=12, num_keypoints=15, num_frames=3,
            transformer=dict(
                encoder=dict(
                    num_layers=1,
                    transformerlayers=dict(attn_cfgs=dict(embed_dims=32),
                                           feedforward_channels=64)),
                decoder=dict(num_layers=2),
                refine_decoder=dict(num_layers=1))),
        test_cfg=dict(max_per_img=5)))
    assert model.freeze_backbone_neck

    rng = np.random.RandomState(0)
    batch = dummy_clip_batch(rng, batch_size=1, num_frames=3, height=96,
                             width=128, num_keypoints=15, max_gt=5,
                             train=True)
    state, tx = create_train_state(
        model, batch, seed=0,
        tx_kwargs=dict(learning_rate=1e-3, accumulate_steps=1,
                       freeze_backbone_neck=True))
    step = make_train_step(model, tx, donate=False)
    before_bb = jax.tree.map(lambda x: np.asarray(x),
                             state.params["backbone"])
    before_neck = jax.tree.map(lambda x: np.asarray(x),
                               state.params["neck"])
    new_state, losses = step(state, batch)
    assert np.isfinite(float(losses["loss"]))
    for name, before, after in (
            ("backbone", before_bb, new_state.params["backbone"]),
            ("neck", before_neck, new_state.params["neck"])):
        diffs = jax.tree.map(
            lambda a, b: float(jnp.abs(jnp.asarray(a) - b).max()),
            before, after)
        assert max(jax.tree.leaves(diffs)) == 0.0, name
    # the head must still train
    hd = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["head"], new_state.params["head"])
    assert max(jax.tree.leaves(hd)) > 0.0
