"""InsPose activation parity vs the reference torch model
(``opera/models/dense_heads/inspose_head.py`` + mmdet FPN), weight
converted: per-level cls/controller/offset outputs, the shared dynamic-FCN
feature map, and the heatmap branch (hm/ae/short-range offset)."""
import sys

import numpy as np
import pytest
import jax

torch = pytest.importorskip("torch")

from reference_oracle import install_stubs, REFERENCE_ROOT

FEAT = 64
H, W = 128, 192
B = 1


def _patch_deform_conv_cpu():
    """Pure-torch DeformConv2d.forward (3x3, pad 1, stride 1): bilinear
    grid_sample per kernel tap + weight contraction — matches the CUDA
    op's semantics (zero padding, align_corners=False index mapping)."""
    import torch.nn.functional as F
    from mmcv.ops import deform_conv

    def forward(self, x, offset):
        N, C, Hh, Ww = x.shape
        w = self.weight                       # (out, C, 3, 3)
        out_ch = w.shape[0]
        taps = []
        idx_y = torch.arange(Hh, dtype=x.dtype).view(1, Hh, 1)
        idx_x = torch.arange(Ww, dtype=x.dtype).view(1, 1, Ww)
        off = offset.view(N, 9, 2, Hh, Ww)
        k = 0
        for ky in (-1, 0, 1):
            for kx in (-1, 0, 1):
                sy = idx_y + ky + off[:, k, 0]
                sx = idx_x + kx + off[:, k, 1]
                gy = (2 * sy + 1) / Hh - 1
                gx = (2 * sx + 1) / Ww - 1
                grid = torch.stack([gx, gy], -1)           # (N, H, W, 2)
                taps.append(F.grid_sample(
                    x, grid, mode="bilinear", padding_mode="zeros",
                    align_corners=False))
                k += 1
        out = 0
        for k2, tap in enumerate(taps):
            wk = w[:, :, k2 // 3, k2 % 3]                  # (out, C)
            out = out + torch.einsum("nchw,oc->nohw", tap, wk)
        return out

    deform_conv.DeformConv2d.forward = forward


def build_reference():
    install_stubs()
    for p in (f"{REFERENCE_ROOT}/third_party/mmdetection", REFERENCE_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    from opera.models import build_model
    from reference_oracle import patch_cpu_fallbacks
    patch_cpu_fallbacks()
    _patch_deform_conv_cpu()

    cfg = dict(
        type='InsPose',
        backbone=dict(
            type='mmdet.ResNet', depth=18, num_stages=4,
            out_indices=(0, 1, 2, 3), frozen_stages=1,
            norm_cfg=dict(type='BN', requires_grad=False), norm_eval=True,
            style='pytorch'),
        neck=dict(
            type='mmdet.FPN', in_channels=[64, 128, 256, 512],
            out_channels=FEAT, start_level=1,
            add_extra_convs='on_output', num_outs=5,
            relu_before_extra_convs=True),
        bbox_head=dict(
            type='opera.InsPoseHead',
            num_classes=1, in_channels=FEAT,
            stacked_convs=4, feat_channels=FEAT,
            stacked_convs_kpt=4, feat_channels_kpt=FEAT,
            stacked_convs_hm=3, feat_channels_hm=FEAT,
            strides=[8, 16, 32, 64, 128],
            center_sampling=True, center_sample_radius=1.5,
            centerness_on_reg=True, regression_normalize=True,
            with_hm_loss=True,
            min_overlap_hm=0.9, min_hm_radius=0, max_hm_radius=3,
            min_overlap_kp=0.9, min_offset_radius=0, max_offset_radius=3,
            loss_cls=dict(type='mmdet.VarifocalLoss', use_sigmoid=True,
                          gamma=2.0, alpha=0.75, iou_weighted=True,
                          loss_weight=1.0),
            loss_bbox=dict(type='mmdet.GIoULoss', loss_weight=1.0),
            loss_hm=dict(type='opera.CenterFocalLoss', loss_weight=1.0)),
        test_cfg=dict(nms_pre=1000, score_thr=0.05,
                      nms=dict(type='soft_nms', iou_threshold=0.3),
                      mask_thresh=0.5, max_per_img=10))
    model = build_model(cfg)
    model.init_weights()
    model.eval()

    # the reference's star_dcn_offset uses .view on a non-contiguous
    # advanced-index result, which newer CPU torch rejects — rebind with
    # .reshape (same semantics, ``inspose_head.py:327-349``)
    head = model.bbox_head

    def star_dcn_offset(offset_pred, gradient_mul):
        N, C, Hh, Ww = offset_pred.size()
        base = head.dcn_base_offset.type_as(offset_pred)
        o = (1 - gradient_mul) * offset_pred.detach() \
            + gradient_mul * offset_pred
        o = o.view(N, C // 2, 2, Hh, Ww)[:, :, [1, 0], :, :]
        o = o[:, [0, 5, 6, 9, 10, 11, 12, 15, 16], :, :].reshape(
            N, -1, Hh, Ww)
        return o - base

    head.star_dcn_offset = star_dcn_offset
    return model


@pytest.fixture(scope="module")
def inspose_pair():
    torch.manual_seed(0)
    ref = build_reference()
    state_dict = {k: v.numpy() for k, v in ref.state_dict().items()}

    from pavenet_tpu.models.detectors.inspose import InsPoseDetector
    from pavenet_tpu.utils.weight_convert import convert_inspose_state_dict

    mine = InsPoseDetector(
        num_keypoints=17, backbone_depth=18, feat_channels=FEAT,
        feat_channels_kpt=FEAT, feat_channels_hm=FEAT,
        stacked_convs=4, stacked_convs_kpt=4, stacked_convs_hm=3,
        with_hm=True)
    variables = convert_inspose_state_dict(state_dict, backbone_depth=18)
    unused = variables.pop("_unused_reference_keys")
    assert unused == [], f"unconverted reference keys: {unused[:10]}"
    return ref, mine, variables


def test_inspose_forward_parity(inspose_pair):
    ref, mine, variables = inspose_pair
    rng = np.random.RandomState(3)
    img = rng.randn(B, H, W, 3).astype(np.float32)

    with torch.no_grad():
        feats = ref.extract_feat(torch.from_numpy(
            img.transpose(0, 3, 1, 2)))
        cls_scores, controllers, offsets, shared = ref.bbox_head(feats)
        hm_t = ref.bbox_head.hm_feat
        ae_t = ref.bbox_head.ae_feat
        hmo_t = ref.bbox_head.hm_offset_feat

    outs, my_shared, hm_feats = jax.jit(
        lambda v, x: mine.apply(v, x, method=InsPoseType.forward_levels)
    )({k: v for k, v in variables.items()}, img)

    errs = {}

    def diff(name, torch_t, jax_t):
        a = torch_t.numpy().transpose(0, 2, 3, 1)
        b = np.asarray(jax_t)
        errs[name] = (np.abs(a - b).max(), max(np.abs(a).max(), 1e-6))

    for lvl in range(5):
        diff(f"cls{lvl}", cls_scores[lvl], outs[lvl]["cls"])
        diff(f"dyn{lvl}", controllers[lvl], outs[lvl]["dyn"])
        diff(f"offset{lvl}", offsets[lvl], outs[lvl]["offset"])
    diff("shared", shared, my_shared)
    diff("hm", hm_t, hm_feats["hm"])
    diff("ae", ae_t, hm_feats["ae"])
    diff("hm_offset", hmo_t, hm_feats["offset"])
    lines = [f"{k}: err {e:.2e} scale {s:.2e}" for k, (e, s) in errs.items()]
    bad = {k: v for k, v in errs.items() if v[0] >= 2e-3 * max(v[1], 1.0)}
    assert not bad, "\n".join(lines)


InsPoseType = None


def setup_module(module):
    from pavenet_tpu.models.detectors.inspose import InsPoseDetector
    module.InsPoseType = InsPoseDetector


def test_heatmap_ae_offset_loss_differential(inspose_pair):
    """Value-level differential of the stride-4 heatmap-branch losses
    (CenterFocal + AE pull/push + short-range offset L1) against the
    reference ``InsPoseHead.heatmap_ae_offset_loss`` on identical inputs —
    this branch has no dependence on the positive-location sampling, so
    the values must match exactly."""
    import jax.numpy as jnp
    ref, mine, variables = inspose_pair
    rng = np.random.RandomState(11)
    Bh, h4, w4, K = 1, 32, 48, 17
    G = 3
    hm = rng.randn(Bh, K, h4, w4).astype(np.float32)
    ae = rng.randn(Bh, K, h4, w4).astype(np.float32)
    off = rng.randn(Bh, 2 * K, h4, w4).astype(np.float32)
    # gt keypoints in full-res coords (fit inside 4*h4 x 4*w4, away from
    # the border so /4 stays in range)
    kpts = np.zeros((G, K, 3), np.float32)
    kpts[..., 0] = rng.uniform(8, 4 * w4 - 8, (G, K))
    kpts[..., 1] = rng.uniform(8, 4 * h4 - 8, (G, K))
    kpts[..., 2] = (rng.rand(G, K) > 0.3) * 2
    kpts[0, :, 2] = 0  # one instance with no valid keypoints
    boxes = np.zeros((G, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 40, G)
    boxes[:, 1] = rng.uniform(0, 30, G)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(30, 80, G)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(30, 80, G)

    with torch.no_grad():
        # NB the reference does hm_pred.sigmoid_() IN PLACE — clone, or it
        # mutates the shared-memory numpy array before our side runs
        want = ref.bbox_head.heatmap_ae_offset_loss(
            torch.from_numpy(hm).clone(), torch.from_numpy(ae).clone(),
            torch.from_numpy(off).clone(),
            [torch.from_numpy(kpts.reshape(G, -1)).clone()],
            [torch.zeros(G, dtype=torch.long)],
            [torch.from_numpy(boxes).clone()], [{}])
    want = [float(x) for x in want]  # hm, ae_pull, ae_push, hm_offset

    hm_feats = {"hm": jnp.asarray(hm.transpose(0, 2, 3, 1)),
                "ae": jnp.asarray(ae.transpose(0, 2, 3, 1)),
                "offset": jnp.asarray(off.transpose(0, 2, 3, 1))}
    got = mine.apply(
        variables, hm_feats, jnp.asarray(kpts[None]),
        jnp.asarray(boxes[None]), jnp.ones((1, G), bool),
        method=type(mine)._heatmap_ae_offset_losses)
    got = {k: float(v) for k, v in got.items()}
    for name, key in (("hm", "loss_heatmap"), ("ae_pull", "loss_ae_pull"),
                      ("ae_push", "loss_ae_push"),
                      ("hm_offset", "loss_heatmap_offset")):
        w = want[["hm", "ae_pull", "ae_push", "hm_offset"].index(name)]
        g = got[key]
        assert abs(g - w) < 2e-4 * max(abs(w), 1.0), (name, g, w, want, got)
