"""InsPose: single-stage instance-aware pose estimation (CondInst-style).

Rebuilds the reference ``opera/models/dense_heads/inspose_head.py`` +
``opera/models/detectors/inspose.py``: FCOS-like per-level towers over an
FPN, a *controller* branch emitting 313 dynamic parameters per location
that configure a 3-layer 1x1-conv FCN over an 8-channel shared feature map
(+ 2 relative-coordinate channels) producing per-instance keypoint
heatmaps, plus a direct keypoint-offset regression branch.

TPU-first notes:
- the reference's star-shaped DeformConv2d tower refinements
  (``inspose_head.py:327`` ``star_dcn_offset``) are expressed through the
  same deformable sampling op as the attention stack (9 fixed kernel taps +
  predicted offsets, then a weight contraction) — no CUDA DCN;
- per-instance dynamic FCNs run as einsums over padded GT slots in-jit
  (the reference loops per positive location in python);
- FCOS assignment (bbox containment + regress ranges + min-area) is
  vectorized over (points, gts).
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.resnet import ResNet
from ..losses.focal_loss import sigmoid_focal_loss
from ...ops.ms_deform_attn import ms_deform_attn

# controller parameter layout (reference ``kpt_fcn_head``: 10->8->8->K)
def _fcn_splits(num_keypoints):
    c1w, c1b = 80, 8      # (8, 10)
    c2w, c2b = 64, 8      # (8, 8)
    c3w = 8 * num_keypoints
    c3b = num_keypoints
    return c1w, c1b, c2w, c2b, c3w, c3b


class ConvGN(nn.Module):
    """ConvModule(conv 3x3 no-bias -> GN -> ReLU), mmcv default order."""
    features: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype)(x)
        return nn.relu(x)


# star-DCN keypoint selection for the 3x3 kernel taps (reference
# ``inspose_head.py:344-347``): nose, shoulders, wrists, hips, ankles
STAR_KPT_IDX_K17 = (0, 5, 6, 9, 10, 11, 12, 15, 16)


def _upsample2x_bilinear(x):
    """F.interpolate(scale_factor=2, mode='bilinear', align_corners=False)
    (reference hm branch, ``inspose_head.py:291``)."""
    B, h, w, C = x.shape
    return jax.image.resize(x, (B, 2 * h, 2 * w, C), method="linear")


class DeformConvGN(nn.Module):
    """3x3 deformable conv + GN, sampled through ``ms_deform_attn``'s
    bilinear gather (replaces the reference's CUDA ``DeformConv2d``)."""
    features: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, offsets):
        """x (B, h, w, C); offsets (B, h, w, 18) in feature cells
        (dy, dx per kernel tap, torch DCN convention)."""
        B, h, w, C = x.shape
        base_y, base_x = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32) + 0.5,
            jnp.arange(w, dtype=jnp.float32) + 0.5, indexing="ij")
        ky, kx = jnp.meshgrid(jnp.arange(-1.0, 2), jnp.arange(-1.0, 2),
                              indexing="ij")
        off = offsets.reshape(B, h * w, 9, 2)
        # normalized sampling locations per tap
        loc_y = (base_y.reshape(-1)[None, :, None]
                 + ky.reshape(-1)[None, None] + off[..., 0]) / h
        loc_x = (base_x.reshape(-1)[None, :, None]
                 + kx.reshape(-1)[None, None] + off[..., 1]) / w
        locs = jnp.stack([loc_x, loc_y], -1)          # (B, hw, 9, 2)
        value = x.reshape(B, h * w, 1, C)
        # each kernel tap is gathered separately (one-hot tap weights) so
        # the 9 taps can be contracted with the conv kernel, not summed
        taps = []
        for t in range(9):
            wt = jnp.zeros((B, h * w, 1, 1, 9), self.dtype).at[..., t].set(1.0)
            taps.append(ms_deform_attn(
                value, ((h, w),), locs.reshape(B, h * w, 1, 1, 9, 2),
                wt, impl="xla"))
        patches = jnp.stack(taps, 2).reshape(B, h * w, 9 * C)
        y = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                     name="kernel")(patches).reshape(B, h, w, self.features)
        y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype)(y)
        return nn.relu(y)


class InsPoseDetector(nn.Module):
    """InsPose R50 (reference ``configs/inspose/inspose_r50_8x4_3x_coco.py``
    + ``opera/models/dense_heads/inspose_head.py``).

    Architecture mirrors the reference for checkpoint compatibility: mmdet
    FPN (start_level=1, 5 outs, extra convs on output), cls/ctrl towers of
    ``stacked_convs`` ConvGN at ``feat_channels``, a kpt tower of
    ``stacked_convs_kpt`` at ``feat_channels_kpt``, a shared tower of
    4x``shared_channels`` + an 8-channel GN(2) tail, and (``with_hm``) a
    heatmap tower at ``feat_channels_hm`` whose last conv runs after a
    bilinear x2 upsample, feeding hm/ae/short-range-offset preds.
    """
    num_classes: int = 1
    num_keypoints: int = 17
    max_gt: int = 30
    backbone_depth: int = 50
    feat_channels: int = 256
    feat_channels_kpt: int = 512
    feat_channels_hm: int = 512
    shared_channels: int = 128
    stacked_convs: int = 4
    stacked_convs_kpt: int = 4
    stacked_convs_hm: int = 3
    with_hm: bool = True
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    regress_ranges: Tuple[Tuple[float, float], ...] = (
        (-1, 64), (64, 128), (128, 256), (256, 512), (512, 1e8))
    max_per_img: int = 100
    # inference suppression (reference test cfg
    # ``configs/inspose/inspose_r50_8x4_3x_coco.py:59-64``)
    nms_iou_thr: float = 0.3
    score_thr: float = 0.05
    # assignment (reference head defaults False/1.5; the production
    # config enables center sampling, cfg ``:35-36``)
    center_sampling: bool = True
    center_sample_radius: float = 1.5
    loss_cls_weight: float = 1.0
    loss_offset_weight: float = 1.0
    loss_hm_weight: float = 1.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from ..necks.fpn import FPN
        self.backbone = ResNet(depth=self.backbone_depth,
                               out_indices=(0, 1, 2, 3), dtype=self.dtype,
                               name="backbone")
        self.neck = FPN(out_channels=self.feat_channels, start_level=1,
                        num_outs=len(self.strides), dtype=self.dtype,
                        name="neck")
        self.cls_tower = [ConvGN(self.feat_channels, dtype=self.dtype,
                                 name=f"cls_tower{i}")
                          for i in range(self.stacked_convs)]
        self.ctrl_tower = [ConvGN(self.feat_channels, dtype=self.dtype,
                                  name=f"ctrl_tower{i}")
                           for i in range(self.stacked_convs)]
        self.kpt_tower = [ConvGN(self.feat_channels_kpt, dtype=self.dtype,
                                 name=f"kpt_tower{i}")
                          for i in range(self.stacked_convs_kpt)]
        # shared tower: 4 ConvGN + an 8-channel ConvGN(groups=2) tail
        # (reference ``_init_layers``: shared_convs[4] has GN(2)+ReLU)
        self.shared_tower = [ConvGN(self.shared_channels, dtype=self.dtype,
                                    name=f"shared_tower{i}")
                             for i in range(4)]
        self.shared_out = ConvGN(8, groups=2, dtype=self.dtype,
                                 name="shared_out")
        bias_init = nn.initializers.constant(
            float(-math.log((1 - 0.01) / 0.01)))
        self.conv_cls = nn.Conv(self.num_classes, (3, 3),
                                padding=[(1, 1)] * 2, bias_init=bias_init,
                                dtype=self.dtype, name="conv_cls")
        n_dyn = sum(_fcn_splits(self.num_keypoints))
        self.controller = nn.Conv(n_dyn, (3, 3), padding=[(1, 1)] * 2,
                                  dtype=self.dtype, name="controller")
        self.kpt_offset = nn.Conv(2 * self.num_keypoints, (3, 3),
                                  padding=[(1, 1)] * 2, dtype=self.dtype,
                                  name="kpt_offset")
        self.cls_star = DeformConvGN(self.feat_channels, dtype=self.dtype,
                                     name="cls_star")
        self.ctr_star = DeformConvGN(self.feat_channels, dtype=self.dtype,
                                     name="ctr_star")
        if self.with_hm:
            self.hm_tower = [ConvGN(self.feat_channels_hm, dtype=self.dtype,
                                    name=f"hm_tower{i}")
                             for i in range(self.stacked_convs_hm)]
            hm_bias = nn.initializers.constant(
                float(-math.log((1 - 0.1) / 0.1)))
            self.hm_pred = nn.Conv(self.num_keypoints, (3, 3),
                                   padding=[(1, 1)] * 2, bias_init=hm_bias,
                                   dtype=self.dtype, name="hm_pred")
            self.ae_pred = nn.Conv(self.num_keypoints, (3, 3),
                                   padding=[(1, 1)] * 2, dtype=self.dtype,
                                   name="ae_pred")
            self.hm_offset = nn.Conv(2 * self.num_keypoints, (3, 3),
                                     padding=[(1, 1)] * 2, dtype=self.dtype,
                                     name="hm_offset")

    def _star_offsets(self, offset):
        """Reference ``star_dcn_offset`` (``inspose_head.py:327-349``):
        gradient-scaled keypoint offsets, (dx,dy) -> (dy,dx), 9 selected
        keypoints minus the 3x3 kernel base positions.  ``DeformConvGN``
        adds the base back, so the net sampling point is exactly
        p0 + keypoint_offset."""
        B, h, w, _ = offset.shape
        K = self.num_keypoints
        gm = 0.1
        o = jax.lax.stop_gradient(offset) * (1 - gm) + offset * gm
        o = o.reshape(B, h, w, K, 2)[..., ::-1]          # (dx,dy)->(dy,dx)
        sel = STAR_KPT_IDX_K17 if K == 17 else tuple(range(9))
        o = o[:, :, :, jnp.asarray(sel)].reshape(B, h, w, 18)
        ky, kx = jnp.meshgrid(jnp.arange(-1.0, 2), jnp.arange(-1.0, 2),
                              indexing="ij")
        base = jnp.stack([ky.reshape(-1), kx.reshape(-1)], -1).reshape(18)
        return o - base.astype(o.dtype)

    # -------------------------------------------------------------- levels
    def forward_levels(self, img):
        feats = self.neck(self.backbone(img))
        outs = []
        shared = None
        hm_feats = None
        for lvl, x in enumerate(feats):
            c = x
            for m in self.cls_tower:
                c = m(c)
            t = x
            for m in self.ctrl_tower:
                t = m(t)
            k = x
            for m in self.kpt_tower:
                k = m(k)
            offset = self.kpt_offset(k)          # (B,h,w,2K) feature cells
            star = self._star_offsets(offset)
            c_star = self.cls_star(c, star)
            t_star = self.ctr_star(t, star)
            cls_score = self.conv_cls(jnp.concatenate([c, c_star], -1))
            dyn = self.controller(jnp.concatenate([t, t_star], -1))
            outs.append(dict(cls=cls_score, dyn=dyn, offset=offset,
                             shape=x.shape[1:3]))
            if lvl == 0:
                s = x
                for m in self.shared_tower:
                    s = m(s)
                shared = self.shared_out(s)      # (B, h0, w0, 8)
                if self.with_hm:
                    hs = x
                    for m in self.hm_tower[:-1]:
                        hs = m(hs)
                    hs = self.hm_tower[-1](_upsample2x_bilinear(hs))
                    hm_feats = dict(hm=self.hm_pred(hs),
                                    ae=self.ae_pred(hs),
                                    offset=self.hm_offset(hs))
        return outs, shared, hm_feats

    @staticmethod
    def level_points(shape, stride):
        h, w = shape
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        return jnp.stack([xx, yy], -1).reshape(-1, 2)

    def dynamic_heatmaps(self, dyn_params, shared, centers, stride=8):
        """Per-instance keypoint heatmaps from dynamic FCN params.

        dyn_params (B, M, 313); shared (B, h0, w0, 8); centers (B, M, 2)
        absolute xy. Returns (B, M, h0, w0, K) logits.
        """
        B, h0, w0, _ = shared.shape
        K = self.num_keypoints
        import numpy as _np
        c1w, c1b, c2w, c2b, c3w, c3b = _fcn_splits(K)
        o = _np.cumsum([0, c1w, c1b, c2w, c2b, c3w, c3b]).tolist()
        ys = (jnp.arange(h0, dtype=jnp.float32) + 0.0) * stride + stride // 2
        xs = (jnp.arange(w0, dtype=jnp.float32) + 0.0) * stride + stride // 2

        def per_inst(p, center, feat):
            cm_x = (xs[None, :] - center[0]) / 128.0
            cm_y = (ys[:, None] - center[1]) / 128.0
            cm = jnp.stack([jnp.broadcast_to(cm_x, (h0, w0)),
                            jnp.broadcast_to(cm_y, (h0, w0))], -1)
            x = jnp.concatenate([feat, cm], -1)          # (h0, w0, 10)
            w1 = p[o[0]:o[1]].reshape(8, 10)
            b1 = p[o[1]:o[2]]
            w2 = p[o[2]:o[3]].reshape(8, 8)
            b2 = p[o[3]:o[4]]
            w3 = p[o[4]:o[5]].reshape(K, 8)
            b3 = p[o[5]:o[6]]
            x = nn.relu(x @ w1.T + b1)
            x = nn.relu(x @ w2.T + b2)
            return x @ w3.T + b3                          # (h0, w0, K)

        return jax.vmap(lambda ps, cs, f: jax.vmap(
            lambda p, c: per_inst(p, c, f))(ps, cs))(
                dyn_params, centers, shared)

    # ---------------------------------------------------------------- train
    def __call__(self, batch, train: bool = False):
        if train:
            return self.forward_train(batch)
        return self.forward_test(batch)

    def _flatten_levels(self, outs):
        cls, dyn, off, pts, strides = [], [], [], [], []
        for lvl, o in enumerate(outs):
            B = o["cls"].shape[0]
            n = o["shape"][0] * o["shape"][1]
            cls.append(o["cls"].reshape(B, n, -1))
            dyn.append(o["dyn"].reshape(B, n, -1))
            off.append(o["offset"].reshape(B, n, -1))
            pts.append(self.level_points(o["shape"], self.strides[lvl]))
            strides.append(jnp.full((n,), self.strides[lvl], jnp.float32))
        return (jnp.concatenate(cls, 1), jnp.concatenate(dyn, 1),
                jnp.concatenate(off, 1), jnp.concatenate(pts, 0),
                jnp.concatenate(strides, 0))

    def _assign(self, points, strides_flat, gt_boxes, gt_valid):
        """FCOS assignment (reference ``inspose_head.py:831-913``):
        center-sampling (production cfg: radius 1.5) or inside-box,
        + regress-range + min-area tie-break."""
        N = points.shape[0]
        x, y = points[:, 0], points[:, 1]
        l = x[:, None] - gt_boxes[None, :, 0]
        t = y[:, None] - gt_boxes[None, :, 1]
        r = gt_boxes[None, :, 2] - x[:, None]
        b = gt_boxes[None, :, 3] - y[:, None]
        ltrb = jnp.stack([l, t, r, b], -1)               # (N, G, 4)
        if self.center_sampling:
            # shrink each gt box to a stride-scaled center box, clipped
            # to the gt (``:858-894``)
            rad = strides_flat[:, None] * self.center_sample_radius
            cx = (gt_boxes[None, :, 0] + gt_boxes[None, :, 2]) / 2
            cy = (gt_boxes[None, :, 1] + gt_boxes[None, :, 3]) / 2
            x0 = jnp.maximum(cx - rad, gt_boxes[None, :, 0])
            y0 = jnp.maximum(cy - rad, gt_boxes[None, :, 1])
            x1 = jnp.minimum(cx + rad, gt_boxes[None, :, 2])
            y1 = jnp.minimum(cy + rad, gt_boxes[None, :, 3])
            cb = jnp.stack([x[:, None] - x0, y[:, None] - y0,
                            x1 - x[:, None], y1 - y[:, None]], -1)
            inside = cb.min(-1) > 0
        else:
            inside = ltrb.min(-1) > 0
        max_reg = ltrb.max(-1)
        ranges = jnp.asarray(self.regress_ranges, jnp.float32)
        # map per-point stride to its range row
        sidx = jnp.searchsorted(jnp.asarray(self.strides, jnp.float32),
                                strides_flat)
        lo = ranges[sidx, 0][:, None]
        hi = ranges[sidx, 1][:, None]
        in_range = (max_reg >= lo) & (max_reg <= hi)
        areas = ((gt_boxes[:, 2] - gt_boxes[:, 0])
                 * (gt_boxes[:, 3] - gt_boxes[:, 1]))
        cand = inside & in_range & gt_valid[None, :]
        big = 1e18
        area_mat = jnp.where(cand, areas[None, :], big)
        gt_idx = area_mat.argmin(-1)
        pos = area_mat.min(-1) < big
        return jnp.where(pos, gt_idx, -1), pos           # (N,), (N,)

    def forward_train(self, batch):
        img = batch["img"]
        B = img.shape[0]
        K = self.num_keypoints
        outs, shared, hm_feats = self.forward_levels(img)
        cls_s, dyn_s, off_s, points, strides_flat = self._flatten_levels(
            outs)

        gt_boxes = batch["gt_boxes"]
        gt_kpts = batch["gt_keypoints"]                  # (B, G, K, 3)
        gt_valid = batch["gt_valid"]
        assign = jax.vmap(lambda b, v: self._assign(
            points, strides_flat, b, v))(gt_boxes, gt_valid)
        gt_idx, pos = assign                             # (B, N)

        labels = jnp.where(pos, 0, self.num_classes)
        num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        losses = {}
        losses["loss_cls"] = sigmoid_focal_loss(
            cls_s.reshape(-1, self.num_classes), labels.reshape(-1),
            avg_factor=num_pos) * self.loss_cls_weight

        # keypoint offset regression at positive points (normalized by
        # stride, reference ``keypoint_target:924``)
        safe = jnp.maximum(gt_idx, 0)
        tgt_k = jnp.take_along_axis(
            gt_kpts, safe[..., None, None], axis=1)      # (B, N, K, 3)
        vis = (tgt_k[..., 2] > 0) & pos[..., None]
        tgt_off = (tgt_k[..., :2] - points[None, :, None, :]) \
            / strides_flat[None, :, None, None]
        pred_off = off_s.reshape(B, -1, K, 2)
        nvis = jnp.maximum(vis.sum().astype(jnp.float32) * 2, 1.0)
        losses["loss_offset"] = (jnp.abs(pred_off - tgt_off)
                                 * vis[..., None]).sum() / nvis \
            * self.loss_offset_weight

        # per-instance dynamic heatmaps on padded GT slots: supervise with
        # per-keypoint gaussians (focal-bce as in CondInst-style heads)
        G = gt_boxes.shape[1]
        # controller params from the gt's assigned best point: use the
        # closest point to the gt center on level 0
        centers = (gt_boxes[..., :2] + gt_boxes[..., 2:]) / 2   # (B, G, 2)
        h0, w0 = outs[0]["shape"]
        n0 = h0 * w0
        cx = jnp.clip((centers[..., 0] // self.strides[0]).astype(jnp.int32),
                      0, w0 - 1)
        cy = jnp.clip((centers[..., 1] // self.strides[0]).astype(jnp.int32),
                      0, h0 - 1)
        pt_idx = cy * w0 + cx                            # (B, G)
        dyn = jnp.take_along_axis(dyn_s[:, :n0], pt_idx[..., None], axis=1)
        hm = self.dynamic_heatmaps(dyn, shared, centers)  # (B,G,h0,w0,K)
        # gaussian targets at stride 8
        ys = (jnp.arange(h0, dtype=jnp.float32) * self.strides[0]
              + self.strides[0] / 2)
        xs = (jnp.arange(w0, dtype=jnp.float32) * self.strides[0]
              + self.strides[0] / 2)
        d2 = ((ys[None, None, :, None, None] - gt_kpts[..., 1][:, :, None,
                                                              None, :]) ** 2
              + (xs[None, None, None, :, None]
                 - gt_kpts[..., 0][:, :, None, None, :]) ** 2)
        sigma2 = (2 * (self.strides[0] * 1.0) ** 2)
        tgt_hm = jnp.exp(-d2 / sigma2)
        kvis = ((gt_kpts[..., 2] > 0)
                & gt_valid[..., None])[:, :, None, None, :]
        tgt_hm = jnp.where(kvis, tgt_hm, 0.0)
        p = jnp.clip(jax.nn.sigmoid(hm), 1e-6, 1 - 1e-6)
        bce = -(tgt_hm * jnp.log(p) + (1 - tgt_hm) * jnp.log(1 - p))
        wmask = gt_valid[..., None, None, None].astype(jnp.float32)
        losses["loss_hm"] = (bce * wmask).sum() / jnp.maximum(
            (wmask * jnp.ones_like(bce)).sum(), 1.0) * self.loss_hm_weight
        losses["loss"] = sum(losses.values())
        return losses

    # ---------------------------------------------------------------- test
    def forward_test(self, batch):
        img = batch["img"]
        B = img.shape[0]
        K = self.num_keypoints
        outs, shared, hm_feats = self.forward_levels(img)
        cls_s, dyn_s, off_s, points, strides_flat = self._flatten_levels(
            outs)
        scores = jax.nn.sigmoid(cls_s)[..., 0]           # (B, N)
        top_scores, idx = jax.lax.top_k(scores, self.max_per_img)
        dyn = jnp.take_along_axis(dyn_s, idx[..., None], axis=1)
        off = jnp.take_along_axis(off_s, idx[..., None], axis=1)
        pts = points[idx]                                # (B, M, 2)
        strd = strides_flat[idx]
        # regressed keypoints: point + offset * stride
        kpts = pts[:, :, None, :] + off.reshape(
            B, self.max_per_img, K, 2) * strd[..., None, None]
        # refine x/y by the dynamic heatmap argmax (reference decodes from
        # the instance heatmap; we fuse both estimates)
        hm = self.dynamic_heatmaps(dyn, shared, pts)     # (B,M,h0,w0,K)
        h0, w0 = hm.shape[2:4]
        flat = hm.reshape(B, self.max_per_img, h0 * w0, K)
        am = flat.argmax(2)
        hm_y = (am // w0).astype(jnp.float32) * self.strides[0] \
            + self.strides[0] / 2
        hm_x = (am % w0).astype(jnp.float32) * self.strides[0] \
            + self.strides[0] / 2
        hm_score = jax.nn.sigmoid(flat.max(2))
        kpts = jnp.where(hm_score[..., None] > 0.1,
                         jnp.stack([hm_x, hm_y], -1), kpts)
        if "scale_factor" in batch:
            kpts = kpts / batch["scale_factor"][:, None, None, :]
        det_kpts = jnp.concatenate([kpts, hm_score[..., None]], -1)
        x1 = kpts[..., 0].min(-1)
        y1 = kpts[..., 1].min(-1)
        x2 = kpts[..., 0].max(-1)
        y2 = kpts[..., 1].max(-1)
        boxes = jnp.stack([x1, y1, x2, y2], -1)
        # linear soft-NMS + score threshold (reference InsPose inference)
        from ...ops.nms import soft_nms_scores
        decayed = jax.vmap(
            lambda b, s: soft_nms_scores(b, s, self.nms_iou_thr))(
                boxes, top_scores)
        det_bboxes = jnp.concatenate([boxes, decayed[..., None]], -1)
        return dict(det_kpts=det_kpts, det_bboxes=det_bboxes,
                    det_labels=jnp.zeros_like(idx),
                    keep=decayed > self.score_thr)
