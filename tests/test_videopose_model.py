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


def test_merge_aug_detections_semantics(model_and_params):
    """The multi-aug merge (reference ``merge_aug_results`` +
    ``multiclass_nms``, ``videoposev1.py:224-262``): union of passes,
    near-duplicates suppressed by box NMS, distinct detections from any
    pass survive, ranked by score."""
    model, variables, _ = model_and_params
    K, M = model.num_keypoints, model.max_per_img

    def person(cx, cy, size=10.0):
        ang = np.linspace(0, 2 * np.pi, K, endpoint=False)
        k = np.stack([cx + size * np.cos(ang), cy + size * np.sin(ang),
                      np.ones(K)], -1)
        return k.astype(np.float32)

    def make_pass(persons, scores):
        kpts = np.zeros((1, M, K, 3), np.float32)
        sc = np.zeros((1, M), np.float32)
        for i, (p, s) in enumerate(zip(persons, scores)):
            kpts[0, i] = p
            sc[0, i] = s
        return dict(det_kpts=jnp.asarray(kpts), scores=jnp.asarray(sc))

    p1, p2 = person(30, 30), person(70, 30)
    p1_jit = person(30.5, 30.2)        # near-duplicate of p1 (IoU ~1)
    p3 = person(30, 80)                # only in pass 2
    o1 = make_pass([p1, p2], [0.9, 0.8])
    o2 = make_pass([p1_jit, p3], [0.85, 0.6])

    out = model.apply(variables, [o1, o2], method="merge_aug_detections")
    keep = np.asarray(out["keep"][0])
    boxes = np.asarray(out["det_bboxes"][0])
    kept_scores = sorted(boxes[keep][:, 4].tolist(), reverse=True)
    # p1 (0.9) suppresses its jittered twin (0.85); p2 and p3 survive
    assert kept_scores == pytest.approx([0.9, 0.8, 0.6])
    # score-descending order with padded slots marked not-kept
    assert boxes[0, 4] == pytest.approx(0.9)
    # keypoint scores reset to 1 after merge (``videoposev1.py:255``)
    assert np.allclose(np.asarray(out["det_kpts"][0])[keep][..., 2], 1.0)


def test_multi_aug_run_inference(model_and_params):
    """run_inference with duplicated scales must reproduce the
    single-pass detections (the merge dedupes identical passes), and a
    genuine two-scale + flip run must produce valid merged output."""
    from pavenet_tpu.apis.test import run_inference, _rescale_batch

    model, variables, _ = model_and_params
    rng = np.random.RandomState(7)
    batch = tiny_batch(rng, B=1, train=False)
    batch["image_id"] = np.array([5])
    batch["_row_valid"] = np.array([True])

    single = run_inference(model, variables, [dict(batch)])
    dup = run_inference(model, variables, [dict(batch)],
                        aug_scales=[1.0, 1.0])
    assert len(dup) <= len(single)
    # every deduped detection matches a single-pass one (scores unique)
    s_by_score = {round(d["score"], 6): d for d in single}
    for d in dup:
        match = s_by_score[round(d["score"], 6)]
        got = np.asarray(d["keypoints"]).reshape(-1, 3)
        want = np.asarray(match["keypoints"]).reshape(-1, 3)
        np.testing.assert_allclose(got[:, :2], want[:, :2], atol=1e-4)

    # geometry of the host rescale helper
    fb = _rescale_batch({k: batch[k] for k in
                         ("img", "img_shape", "scale_factor")}, 0.5)
    assert fb["img_shape"].tolist() == [[32, 40]]
    np.testing.assert_allclose(fb["scale_factor"], 0.5)

    merged = run_inference(model, variables, [dict(batch)],
                           aug_scales=[1.0, 0.75], flip_test=True)
    assert merged and all(np.isfinite(d["score"]) for d in merged)
    for d in merged:
        k = np.asarray(d["keypoints"]).reshape(-1, 3)
        assert np.isfinite(k).all()


def test_train_step_rbg_prng():
    """prng_impl='rbg' (the tools/train.py default): the step runs, is
    deterministic per seed, stores the rng as a plain uint32 array (no
    typed-key leaves in checkpoints), and actually uses a different
    dropout stream than threefry."""
    from pavenet_tpu.apis.train import create_train_state, make_train_step

    rng = np.random.RandomState(0)
    model = tiny_model()
    batch = tiny_batch(rng, train=True)

    def run(prng_impl):
        state, tx = create_train_state(
            model, batch, seed=0, prng_impl=prng_impl,
            tx_kwargs=dict(learning_rate=1e-4))
        assert isinstance(state.rng, jax.Array)
        assert state.rng.dtype == jnp.uint32
        step = make_train_step(model, tx, donate=False,
                               prng_impl=prng_impl)
        new_state, losses = step(state, batch)
        return new_state, {k: float(v) for k, v in losses.items()}

    s1, l1 = run("rbg")
    s2, l2 = run("rbg")
    assert l1 == l2  # deterministic per seed
    for v in l1.values():
        assert np.isfinite(v)
    # rng state advanced and stays a plain array (checkpoint-safe)
    assert s1.rng.dtype == jnp.uint32
    _, l3 = run(None)  # threefry stream differs (dropout masks differ)
    assert any(l1[k] != l3[k] for k in l1)
