"""PETR (single-frame) activation + loss parity vs the reference torch
model (``opera/models/dense_heads/petr_head.py:21`` + ``PETRTransformer``
``opera/models/utils/transformer.py:4235``), weight-converted — the
round-1 VERDICT item 5 gate.

Covers: all decoder cls/kpt outputs, encoder (RPN) outputs, the heatmap
branch (note the reference's hm encoder receives no positional embedding
— ``query_pose`` typo at ``transformer.py:4565`` — reproduced), the
refine (joint) decoder outputs, and the full training loss dict
(L1 + OKS + heatmap recipe, ``configs/petr/petr_r50_16x2_100e_coco.py``).
"""
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_oracle import install_stubs, REFERENCE_ROOT

EMBED, NQ, K = 64, 20, 17
ENC_LAYERS, DEC_LAYERS, REF_LAYERS = 2, 2, 1
H, W = 128, 192
B = 1


def build_reference(backbone="resnet"):
    install_stubs()
    for p in (f"{REFERENCE_ROOT}/third_party/mmdetection", REFERENCE_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    from opera.models import build_model
    from reference_oracle import patch_cpu_fallbacks
    patch_cpu_fallbacks()

    layer = dict(
        type='mmcv.DetrTransformerDecoderLayer',
        attn_cfgs=[
            dict(type='mmcv.MultiheadAttention', embed_dims=EMBED,
                 num_heads=8, dropout=0.0),
            dict(type='opera.MultiScaleDeformablePoseAttention',
                 num_points=K, embed_dims=EMBED)],
        ffn_cfgs=dict(type='FFN', embed_dims=EMBED,
                      feedforward_channels=128, ffn_drop=0.0),
        feedforward_channels=128, ffn_dropout=0.0,
        operation_order=('self_attn', 'norm', 'cross_attn', 'norm',
                         'ffn', 'norm'))
    enc_layer = dict(
        type='mmcv.BaseTransformerLayer',
        attn_cfgs=dict(type='mmcv.MultiScaleDeformableAttention',
                       embed_dims=EMBED),
        ffn_cfgs=dict(type='FFN', embed_dims=EMBED,
                      feedforward_channels=128, ffn_drop=0.0),
        feedforward_channels=128, ffn_dropout=0.0,
        operation_order=('self_attn', 'norm', 'ffn', 'norm'))
    hm_layer = dict(enc_layer)
    hm_layer["attn_cfgs"] = dict(type='mmcv.MultiScaleDeformableAttention',
                                 embed_dims=EMBED, num_levels=1)
    refine_layer = dict(layer)
    refine_layer["attn_cfgs"] = [
        dict(type='mmcv.MultiheadAttention', embed_dims=EMBED,
             num_heads=8, dropout=0.0),
        dict(type='mmcv.MultiScaleDeformableAttention', embed_dims=EMBED,
             im2col_step=128)]

    if backbone == "hrnet":
        # mmdet HRNet-W32 (reference petr_hrnetw48 config shape, W=32
        # for test weight): emits branches 1..3 -> neck in [64,128,256]
        backbone_cfg = dict(
            type='mmdet.HRNet', in_channels=3, norm_eval=True,
            extra=dict(
                stage1=dict(num_modules=1, num_branches=1,
                            block='BOTTLENECK', num_blocks=(4,),
                            num_channels=(64,)),
                stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                            num_blocks=(4, 4), num_channels=(32, 64)),
                stage3=dict(num_modules=4, num_branches=3, block='BASIC',
                            num_blocks=(4, 4, 4),
                            num_channels=(32, 64, 128)),
                stage4=dict(num_modules=3, num_branches=4, block='BASIC',
                            num_blocks=(4, 4, 4, 4),
                            num_channels=(32, 64, 128, 256))))
        neck_in = [64, 128, 256]
    else:
        backbone_cfg = dict(
            type='mmdet.ResNet', depth=18, num_stages=4,
            out_indices=(1, 2, 3), frozen_stages=1,
            norm_cfg=dict(type='BN', requires_grad=False), norm_eval=True,
            style='pytorch')
        neck_in = [128, 256, 512]
    cfg = dict(
        type='PETR',
        backbone=backbone_cfg,
        neck=dict(
            type='mmdet.ChannelMapper', in_channels=neck_in,
            kernel_size=1, out_channels=EMBED, act_cfg=None,
            norm_cfg=dict(type='GN', num_groups=32), num_outs=4),
        bbox_head=dict(
            type='opera.PETRHead',
            num_query=NQ, num_classes=1, in_channels=512,
            num_keypoints=K, sync_cls_avg_factor=True,
            with_kpt_refine=True, as_two_stage=True,
            transformer=dict(
                type='opera.PETRTransformer',
                num_keypoints=K, two_stage_num_proposals=NQ,
                encoder=dict(type='mmcv.DetrTransformerEncoder',
                             num_layers=ENC_LAYERS,
                             transformerlayers=enc_layer),
                decoder=dict(type='opera.PetrTransformerDecoder',
                             num_keypoints=K, num_layers=DEC_LAYERS,
                             return_intermediate=True,
                             transformerlayers=layer),
                hm_encoder=dict(type='mmcv.DetrTransformerEncoder',
                                num_layers=1, transformerlayers=hm_layer),
                refine_decoder=dict(
                    type='mmcv.DeformableDetrTransformerDecoder',
                    num_layers=REF_LAYERS, return_intermediate=True,
                    transformerlayers=refine_layer)),
            positional_encoding=dict(
                type='mmcv.SinePositionalEncoding', num_feats=EMBED // 2,
                normalize=True, offset=-0.5),
            loss_cls=dict(type='mmdet.FocalLoss', use_sigmoid=True,
                          gamma=2.0, alpha=0.25, loss_weight=2.0),
            loss_kpt=dict(type='mmdet.L1Loss', loss_weight=70.0),
            loss_kpt_rpn=dict(type='mmdet.L1Loss', loss_weight=70.0),
            loss_oks=dict(type='opera.OKSLoss', num_keypoints=K,
                          loss_weight=2.0),
            loss_hm=dict(type='opera.CenterFocalLoss', loss_weight=4.0),
            loss_kpt_refine=dict(type='mmdet.L1Loss', loss_weight=80.0),
            loss_oks_refine=dict(type='opera.OKSLoss', num_keypoints=K,
                                 loss_weight=3.0)),
        train_cfg=dict(assigner=dict(
            type='opera.PoseHungarianAssigner',
            cls_cost=dict(type='mmdet.FocalLossCost', weight=2.0),
            kpt_cost=dict(type='opera.KptL1Cost', weight=70.0),
            oks_cost=dict(type='opera.OksCost', num_keypoints=K,
                          weight=7.0))),
        test_cfg=dict(max_per_img=5))
    model = build_model(cfg)
    model.init_weights()  # uninitialized-memory params otherwise
    model.eval()
    return model


@pytest.fixture(scope="module")
def petr_pair():
    torch.manual_seed(0)
    ref = build_reference()
    state_dict = {k: v.numpy() for k, v in ref.state_dict().items()}

    from pavenet_tpu.models.detectors import VideoPoseDetector
    from pavenet_tpu.utils.weight_convert import convert_petr_state_dict

    mine = VideoPoseDetector(
        num_frames=1, num_keypoints=K, num_query=NQ, max_gt=4,
        backbone_depth=18, embed_dims=EMBED,
        num_encoder_layers=ENC_LAYERS, num_decoder_layers=DEC_LAYERS,
        num_refine_layers=REF_LAYERS, feedforward_channels=128,
        dropout=0.0,  # the reduced reference config zeroes all dropouts
        max_per_img=5, kpt_loss="l1", with_rescoring=False,
        with_heatmap=True, with_nms=False,
        query_from_encoder_token=False, detach_decoder_refs=True,
        loss_cls_weight=2.0, loss_kpt_weight=70.0,
        loss_kpt_rpn_weight=70.0, loss_kpt_refine_weight=80.0,
        loss_oks_weight=2.0, loss_oks_refine_weight=3.0,
        loss_hm_weight=4.0)
    rng = np.random.RandomState(0)
    init_batch = dict(
        img=jnp.zeros((B, 1, H, W, 3), jnp.float32),
        img_shape=jnp.asarray([[H, W]] * B, jnp.int32),
        scale_factor=jnp.ones((B, 2), jnp.float32),
        gt_keypoints=jnp.zeros((B, 4, K, 3), jnp.float32),
        gt_areas=jnp.ones((B, 4), jnp.float32),
        gt_valid=jnp.zeros((B, 4), bool))
    init_vars = jax.jit(lambda: mine.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        init_batch, train=True))()
    variables = convert_petr_state_dict(
        state_dict, init_vars["params"], num_decoder_layers=DEC_LAYERS,
        num_refine_layers=REF_LAYERS, num_encoder_layers=ENC_LAYERS,
        backbone_depth=18)
    assert not variables.pop("_unused_reference_keys"), "unconverted keys"
    return ref, mine, variables


def _close(name, got, want, atol=2e-3):
    got = np.asarray(got)
    want = np.asarray(want.detach().numpy() if hasattr(want, "detach")
                      else want)
    assert got.shape == want.shape, (name, got.shape, want.shape)
    diff = np.abs(got - want).max()
    assert diff < atol, (f"{name}: max diff {diff}")


def test_petr_forward_parity(petr_pair):
    ref, mine, variables = petr_pair
    rng = np.random.RandomState(0)
    img = rng.randn(B, 3, H, W).astype(np.float32)
    img_h, img_w = H - 16, W - 11
    img_metas = [dict(batch_input_shape=(H, W),
                      img_shape=(img_h, img_w, 3))] * B

    ref.train()  # hm branch only runs in train mode
    for m in ref.modules():  # silence deformable-attn dropout (p=0.1)
        if isinstance(m, torch.nn.Dropout):
            m.eval()
    try:
        with torch.no_grad():
            feats = ref.extract_feat(torch.from_numpy(img))
            (cls_t, kpt_t, enc_cls_t, enc_kpt_t, hm_proto, memory_t,
             masks_t) = ref.bbox_head.forward(feats, img_metas)
    finally:
        ref.eval()

    batch_img = jnp.asarray(img.transpose(0, 2, 3, 1)[:, None])
    img_shape = jnp.asarray([[img_h, img_w]] * B, jnp.int32)
    out = mine.apply(variables, batch_img, img_shape,
                     method="forward_outputs", return_heatmap=True)

    _close("enc_cls", out["enc_cls_scores"], enc_cls_t, atol=5e-3)
    _close("enc_kpt", out["enc_kpt_preds"], enc_kpt_t)
    _close("cls", out["all_cls_scores"], cls_t, atol=5e-3)
    _close("kpt", out["all_kpt_preds"], kpt_t)
    hm_pred_t, _hm_mask_t = hm_proto
    _close("hm", out["hm_pred"].transpose(0, 3, 1, 2), hm_pred_t,
           atol=5e-3)

    # ---- refine (joint) decoder on all queries, eval path --------------
    kpt_flat = kpt_t[-1].flatten(0, 1)                     # (B*Q, 2K)
    with torch.no_grad():
        refine_t = ref.bbox_head.forward_refine(
            memory_t, masks_t,
            (kpt_flat, None, None, torch.ones_like(kpt_flat)), None, None)
    ref_poses = out["all_kpt_preds"][-1][:, :, None, :]    # (B, Q, 1, 2K)
    refine_kpts, _, _ = mine.apply(
        variables, out["memory"], out["mask_flatten"],
        out["valid_ratios"], jnp.asarray(ref_poses),
        out["spatial_shapes"], method="refine_head")
    _close("refine_kpt", refine_kpts.reshape(REF_LAYERS, B * NQ, K, 2),
           refine_t)


def test_petr_loss_parity(petr_pair):
    ref, mine, variables = petr_pair
    rng = np.random.RandomState(3)
    img = rng.randn(B, 3, H, W).astype(np.float32)
    img_h, img_w = H - 16, W - 11
    G, MAXG = 3, 4

    kpts = np.zeros((G, K, 3), np.float32)
    kpts[..., 0] = rng.uniform(5, img_w - 5, (G, K))
    kpts[..., 1] = rng.uniform(5, img_h - 5, (G, K))
    kpts[..., 2] = (rng.rand(G, K) > 0.3) * 2.0
    kpts[:, 0, 2] = 2.0
    areas = rng.uniform(1e3, 6e3, (G,)).astype(np.float32)
    bboxes = np.zeros((G, 4), np.float32)
    vis = kpts[..., 2] > 0
    bboxes[:, 0] = np.where(vis, kpts[..., 0], np.inf).min(1) - 2
    bboxes[:, 1] = np.where(vis, kpts[..., 1], np.inf).min(1) - 2
    bboxes[:, 2] = np.where(vis, kpts[..., 0], -np.inf).max(1) + 2
    bboxes[:, 3] = np.where(vis, kpts[..., 1], -np.inf).max(1) + 2

    img_metas = [dict(batch_input_shape=(H, W),
                      img_shape=(img_h, img_w, 3))] * B
    ref.train()
    for m in ref.modules():  # silence deformable-attn dropout (p=0.1)
        if isinstance(m, torch.nn.Dropout):
            m.eval()
    try:
        with torch.no_grad():
            feats = ref.extract_feat(torch.from_numpy(img))
            losses_ref = ref.bbox_head.forward_train(
                feats, img_metas,
                [torch.from_numpy(bboxes.copy())],
                [torch.zeros(G, dtype=torch.long)],
                [torch.from_numpy(kpts.reshape(G, -1).copy())],
                [torch.from_numpy(areas.copy())])
    finally:
        ref.eval()
    losses_ref = {k: float(v.detach().reshape(-1)[0].numpy())
                  for k, v in losses_ref.items()}

    pk = np.zeros((B, MAXG, K, 3), np.float32)
    pa = np.full((B, MAXG), 1.0, np.float32)
    pv = np.zeros((B, MAXG), bool)
    pb = np.zeros((B, MAXG, 4), np.float32)
    pk[0, :G] = kpts
    pa[0, :G] = areas
    pv[0, :G] = True
    pb[0, :G] = bboxes
    batch = dict(
        img=jnp.asarray(img.transpose(0, 2, 3, 1)[:, None]),
        img_shape=jnp.asarray([[img_h, img_w]] * B, jnp.int32),
        scale_factor=jnp.ones((B, 2), jnp.float32),
        gt_keypoints=jnp.asarray(pk), gt_areas=jnp.asarray(pa),
        gt_valid=jnp.asarray(pv), gt_bboxes=jnp.asarray(pb))
    losses = mine.apply(variables, batch, train=True,
                        rngs={"dropout": jax.random.PRNGKey(0)})
    losses = {k: float(v) for k, v in losses.items()}

    assert set(losses_ref) <= set(losses), (
        sorted(losses_ref), sorted(losses))
    bad = {k: (losses[k], want) for k, want in losses_ref.items()
           if abs(losses[k] - want) > 5e-3 + 2e-2 * abs(want)}
    assert not bad, (bad, losses_ref)


def test_petr_hrnet_conversion():
    """PETR-with-HRNet checkpoint conversion (reference config
    ``configs/petr/petr_hrnetw48_16x2_100e_coco.py``): the converter must
    dispatch the HRNet backbone tree (round-3 ADVICE medium item) — zero
    unconverted keys and backbone+neck activation parity."""
    torch.manual_seed(0)
    ref = build_reference(backbone="hrnet")
    state_dict = {k: v.numpy() for k, v in ref.state_dict().items()}

    from pavenet_tpu.models.detectors import VideoPoseDetector
    from pavenet_tpu.utils.weight_convert import convert_petr_state_dict

    mine = VideoPoseDetector(
        num_frames=1, num_keypoints=K, num_query=NQ, max_gt=4,
        backbone_type="hrnet", hrnet_width=32, embed_dims=EMBED,
        num_encoder_layers=ENC_LAYERS, num_decoder_layers=DEC_LAYERS,
        num_refine_layers=REF_LAYERS, feedforward_channels=128,
        dropout=0.0, max_per_img=5, kpt_loss="l1", with_rescoring=False,
        with_heatmap=True, with_nms=False,
        query_from_encoder_token=False, detach_decoder_refs=True)
    init_batch = dict(
        img=jnp.zeros((B, 1, H, W, 3), jnp.float32),
        img_shape=jnp.asarray([[H, W]] * B, jnp.int32),
        scale_factor=jnp.ones((B, 2), jnp.float32),
        gt_keypoints=jnp.zeros((B, 4, K, 3), jnp.float32),
        gt_areas=jnp.ones((B, 4), jnp.float32),
        gt_valid=jnp.zeros((B, 4), bool))
    init_vars = jax.jit(lambda: mine.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        init_batch, train=True))()
    variables = convert_petr_state_dict(
        state_dict, init_vars["params"], num_decoder_layers=DEC_LAYERS,
        num_refine_layers=REF_LAYERS, num_encoder_layers=ENC_LAYERS,
        backbone_type="hrnet", hrnet_width=32)
    assert not variables.pop("_unused_reference_keys"), "unconverted keys"

    rng = np.random.RandomState(1)
    img = rng.randn(B, 3, H, W).astype(np.float32)
    with torch.no_grad():
        feats_t = ref.extract_feat(torch.from_numpy(img))
    feats = mine.apply(variables, jnp.asarray(
        img.transpose(0, 2, 3, 1)[:, None]), method="extract_feats")
    # neck emits 4 levels (last = extra stride); compare the mapped 3
    for i in range(3):
        want = feats_t[i].numpy().transpose(0, 2, 3, 1)[:, None]
        got = np.asarray(feats[i])
        assert got.shape == want.shape, (i, got.shape, want.shape)
        diff = np.abs(got - want).max()
        rel = diff / max(np.abs(want).max(), 1.0)
        assert rel < 1e-4, (i, diff, rel)
