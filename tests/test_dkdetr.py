"""DK-DETR (open-vocab SOIT) smoke test: text-embedding classification."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

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


# ---------------------------------------------------------------------
# Trainable backbone BN (DK-DETR: SyncBN requires_grad=True,
# norm_eval=False — ``dkd_r50_70e_lvis.py:14``)
# ---------------------------------------------------------------------
def test_trainable_bn_resnet_matches_torch():
    """norm_eval=False ResNet in train mode vs the reference mmdet ResNet
    (BN requires_grad=True, norm_eval=False, frozen_stages=1, .train()):
    full-backbone activation parity on converted weights — batch-stat
    normalization everywhere except the frozen stem/stage1, which mmdet
    keeps in eval mode."""
    torch = pytest.importorskip("torch")
    import sys
    from reference_oracle import install_stubs, REFERENCE_ROOT
    install_stubs()
    for p in (f"{REFERENCE_ROOT}/third_party/mmdetection", REFERENCE_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    from mmdet.models.backbones.resnet import ResNet as RefResNet
    from pavenet_tpu.models.backbones.resnet import ResNet
    from pavenet_tpu.utils.weight_convert import _resnet, _StateDict

    torch.manual_seed(0)
    ref = RefResNet(depth=18, num_stages=4, out_indices=(0, 1, 2, 3),
                    frozen_stages=1,
                    norm_cfg=dict(type="BN", requires_grad=True),
                    norm_eval=False, style="pytorch")
    ref.init_weights()
    ref.train()   # trainable BN active, stem/stage1 re-frozen to eval

    # .copy(): .numpy() aliases the live torch buffers, and the torch
    # forward below updates running stats in place — without the copy the
    # "pre-forward" stats silently become post-forward ones
    sd = _StateDict({f"backbone.{k}": v.detach().numpy().copy()
                     for k, v in ref.state_dict().items()})
    params, stats = _resnet(sd, 18)

    model = ResNet(depth=18, out_indices=(0, 1, 2, 3), norm_eval=False,
                   frozen_stages=1)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(
            torch.from_numpy(x.transpose(0, 3, 1, 2)))]
    got, mutated = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=True, mutable=["batch_stats"])
    for lvl, (g, w) in enumerate(zip(got, want)):
        g = np.asarray(g).transpose(0, 3, 1, 2)
        assert g.shape == w.shape, (lvl, g.shape, w.shape)
        err = np.abs(g - w).max()
        assert err < 2e-3, (lvl, err)
    # frozen stem stats untouched; trainable stage stats updated
    assert np.allclose(mutated["batch_stats"]["bn1"]["mean"],
                       np.asarray(stats["bn1"]["mean"]))
    assert not np.allclose(mutated["batch_stats"]["layer2_0"]["bn1"]["mean"],
                           np.asarray(stats["layer2_0"]["bn1"]["mean"]))
    # running-stat update matches torch momentum semantics: run the torch
    # model once more so both sides have taken exactly one train step
    ref_bn = dict(ref.named_modules())["layer2.0.bn1"]
    got_mean = np.asarray(mutated["batch_stats"]["layer2_0"]["bn1"]["mean"])
    want_mean = ref_bn.running_mean.detach().numpy()
    assert np.abs(got_mean - want_mean).max() < 1e-4


def test_trainable_bn_train_step_updates_stats():
    """make_train_step with a norm_eval=False model threads the mutated
    batch_stats through TrainState (frozen-BN models keep them fixed)."""
    from pavenet_tpu.apis.train import create_train_state, make_train_step
    from pavenet_tpu.models.detectors.soit import SOITDetector

    model = SOITDetector(
        num_classes=3, num_query=8, max_gt=2, backbone_depth=18,
        embed_dims=32, num_encoder_layers=1, num_decoder_layers=1,
        feedforward_channels=64, max_per_img=4, norm_eval=False)
    rng = np.random.RandomState(0)
    B, H, W, G = 1, 48, 64, 2
    boxes = np.array([[[4, 4, 30, 30], [20, 10, 50, 40]]], np.float32)
    batch = dict(
        img=rng.randn(B, H, W, 3).astype(np.float32),
        img_shape=np.array([[H, W]], np.int32),
        scale_factor=np.ones((B, 2), np.float32),
        gt_boxes=boxes,
        gt_labels=np.zeros((B, G), np.int64),
        gt_masks=(rng.rand(B, G, H, W) > 0.7).astype(np.float32),
        gt_valid=np.ones((B, G), bool),
    )
    state, tx = create_train_state(
        model, batch, tx_kwargs=dict(accumulate_steps=1,
                                     learning_rate=1e-4,
                                     trainable_bn=True))
    step = make_train_step(model, tx, donate=False)
    before = jax.tree.map(np.asarray, state.batch_stats)
    state2, losses = step(state, batch)
    after = jax.tree.map(np.asarray, state2.batch_stats)
    for k in losses:
        assert np.isfinite(float(losses[k])), k
    diff = jax.tree.map(lambda a, b: float(np.abs(a - b).max()),
                        before, after)
    assert max(jax.tree.leaves(diff)) > 0, "batch_stats did not update"
    # BN affines beyond the frozen stem/stage1 received updates
    p0 = np.asarray(state.params["backbone"]["layer2_0"]["bn1"]["scale"])
    p1 = np.asarray(state2.params["backbone"]["layer2_0"]["bn1"]["scale"])
    assert np.abs(p0 - p1).max() > 0, "trainable BN affine frozen"


def test_clip_text_encoder_math_offline():
    """Prompt templating + ensembling math (reference
    ``text_encoder.py:147-150,176-179``) against a stub embedding model —
    the HF call is the only part left untested offline."""
    import numpy as np
    from pavenet_tpu.models.text_encoder import (
        CLIPTextEncoder, VILD_TEMPLATES, build_prompts,
        ensemble_prompt_embeddings)

    names = ["cat", "stop sign"]
    templates = ("a photo of a {}.", "itap of my {}.", "the toy {}.")
    prompts = build_prompts(names, templates)
    # prompt-major order: [t0(c0), t0(c1), t1(c0), t1(c1), ...]
    assert prompts == [
        "a photo of a cat.", "a photo of a stop sign.",
        "itap of my cat.", "itap of my stop sign.",
        "the toy cat.", "the toy stop sign."]
    assert len(VILD_TEMPLATES) == 63  # the full ViLD ensemble

    # stub embedder: deterministic per-prompt vectors
    D = 8
    rng = np.random.RandomState(0)
    table = {p: rng.randn(D).astype(np.float32) for p in prompts}

    def embed_fn(ps):
        return np.stack([table[p] for p in ps])

    enc = CLIPTextEncoder(names, templates=templates, embed_fn=embed_fn)
    feats = enc.get_text_feat()
    assert feats.shape == (2, D)
    # reference math: raw (un-normalized) mean over templates per class
    want_cat = np.mean([table[t.format("cat")] for t in templates], 0)
    np.testing.assert_allclose(feats[0], want_cat, rtol=1e-6)
    want_sign = np.mean(
        [table[t.format("stop sign")] for t in templates], 0)
    np.testing.assert_allclose(feats[1], want_sign, rtol=1e-6)
    # cached second call
    assert enc.get_text_feat() is feats

    # ensemble helper rejects shape mismatches
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        ensemble_prompt_embeddings(np.zeros((5, D)), 3, 2)
