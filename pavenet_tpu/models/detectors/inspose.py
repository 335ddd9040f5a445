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
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.resnet import ResNet
from ..losses.focal_loss import varifocal_loss
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

    def dynamic_heatmaps(self, dyn_params, shared, centers, normalize=None,
                         stride=8):
        """Per-instance keypoint heatmaps from dynamic FCN params.

        dyn_params (B, M, 313); shared (B, h0, w0, 8); centers (B, M, 2)
        absolute xy; normalize (B, M) per-instance coord-map scale
        (reference ``get_coord_map`` is called with ``2**lvl * 64`` for a
        location on FPN level ``lvl``).  Returns (B, M, h0, w0, K) logits.
        """
        B, h0, w0, _ = shared.shape
        K = self.num_keypoints
        import numpy as _np
        c1w, c1b, c2w, c2b, c3w, c3b = _fcn_splits(K)
        o = _np.cumsum([0, c1w, c1b, c2w, c2b, c3w, c3b]).tolist()
        ys = (jnp.arange(h0, dtype=jnp.float32) + 0.0) * stride + stride // 2
        xs = (jnp.arange(w0, dtype=jnp.float32) + 0.0) * stride + stride // 2
        if normalize is None:
            normalize = jnp.full(centers.shape[:2], 64.0, jnp.float32)

        def per_inst(p, center, norm, feat):
            cm_x = (xs[None, :] - center[0]) / norm
            cm_y = (ys[:, None] - center[1]) / norm
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

        return jax.vmap(lambda ps, cs, ns, f: jax.vmap(
            lambda p, c, n: per_inst(p, c, n, f))(ps, cs, ns))(
                dyn_params, centers, normalize, shared)

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

    def _compute_oks(self, pred_cells, gt_cells, gt_areas):
        """Reference ``compute_oks`` (``inspose_head.py:554-570``) on /8
        cell coordinates, vectorized over padded GT slots; ``gt_areas`` is
        the full-resolution instance area (the reference uses the gt mask
        area; box area is the surrogate here — no masks in the batch)."""
        from ..losses.oks_loss import OKS_SIGMAS
        sig = jnp.asarray(OKS_SIGMAS[self.num_keypoints], jnp.float32)
        var = (sig * 2) ** 2
        valid = gt_cells[..., 2] > 0                       # (B, G, K)
        d2 = ((pred_cells[..., 0] - gt_cells[..., 0]) ** 2
              + (pred_cells[..., 1] - gt_cells[..., 1]) ** 2)
        e = d2 / var / (gt_areas[..., None] + 1e-4) / 2
        sim = jnp.where(valid, jnp.exp(-e), 0.0)
        return sim.sum(-1) / jnp.maximum(valid.sum(-1), 1)  # (B, G)

    def forward_train(self, batch):
        """Training losses mirroring the reference ``loss()``
        (``inspose_head.py:351-553``): VarifocalLoss with OKS-quality
        targets, softmax cross-entropy over the dynamic instance heatmap
        at the gt keypoint cell, stride-normalized L1 keypoint offsets,
        and (``with_hm``) the stride-4 heatmap branch losses
        (CenterFocal + associative-embedding pull/push + short-range
        offset L1, ``heatmap_ae_offset_loss:929``).

        TPU deviation (documented): the dynamic-FCN terms use ONE
        controller per gt (sampled at the gt center's level-0 cell) on
        padded gt slots instead of the reference's python loop over every
        positive location — same supervision signal, static shapes.
        """
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
        num_pos = pos.sum().astype(jnp.float32)
        losses = {}

        # ---- dynamic instance heatmaps (one controller per gt slot)
        G = gt_boxes.shape[1]
        centers = (gt_boxes[..., :2] + gt_boxes[..., 2:]) / 2   # (B, G, 2)
        h0, w0 = outs[0]["shape"]
        n0 = h0 * w0
        cx = jnp.clip((centers[..., 0] // self.strides[0]).astype(jnp.int32),
                      0, w0 - 1)
        cy = jnp.clip((centers[..., 1] // self.strides[0]).astype(jnp.int32),
                      0, h0 - 1)
        pt_idx = cy * w0 + cx                            # (B, G)
        dyn = jnp.take_along_axis(dyn_s[:, :n0], pt_idx[..., None], axis=1)
        # controller points live on level 0 -> coord normalize 2^0*64
        hm = self.dynamic_heatmaps(dyn, shared, centers)  # (B,G,h0,w0,K)

        # loss_keypoint: softmax cross-entropy over the h0*w0 cells at the
        # gt keypoint cell (reference ``:469-474``: F.cross_entropy of the
        # flattened heatmap against y*W + x of floor(gt/8))
        gt_cells = jnp.concatenate(
            [jnp.floor(gt_kpts[..., :2] / self.strides[0]),
             gt_kpts[..., 2:]], -1)
        cell_x = jnp.clip(gt_cells[..., 0].astype(jnp.int32), 0, w0 - 1)
        cell_y = jnp.clip(gt_cells[..., 1].astype(jnp.int32), 0, h0 - 1)
        tgt_cell = cell_y * w0 + cell_x                  # (B, G, K)
        logp = jax.nn.log_softmax(
            hm.reshape(B, G, n0, K).transpose(0, 1, 3, 2), axis=-1)
        picked = jnp.take_along_axis(logp, tgt_cell[..., None],
                                     axis=-1)[..., 0]   # (B, G, K)
        kvalid = ((gt_kpts[..., 2] > 0) & gt_valid[..., None]).astype(
            jnp.float32)
        n_kp = kvalid.sum()
        losses["loss_keypoint"] = -(picked * kvalid).sum() \
            / jnp.maximum(n_kp, 1.0)

        # loss_cls: VarifocalLoss, target = decoded-pose OKS at positives
        # (reference ``:480-523``; unvisible_weight for gts with no valid
        # keypoint)
        flat = hm.reshape(B, G, n0, K)
        am = flat.argmax(2)                              # (B, G, K)
        pred_cells = jnp.stack(
            [(am % w0).astype(jnp.float32),
             (am // w0).astype(jnp.float32)], -1)
        areas = ((gt_boxes[..., 2] - gt_boxes[..., 0])
                 * (gt_boxes[..., 3] - gt_boxes[..., 1]))
        oks = jax.lax.stop_gradient(
            self._compute_oks(pred_cells, gt_cells, areas))  # (B, G)
        has_valid = (gt_kpts[..., 2] > 0).any(-1)
        gt_weight = jnp.where(has_valid, oks, 0.1)       # unvisible_weight
        safe = jnp.maximum(gt_idx, 0)
        point_w = jnp.take_along_axis(gt_weight, safe, axis=1)
        target_score = jnp.where(pos, point_w, 0.0)      # (B, N)
        losses["loss_cls"] = varifocal_loss(
            cls_s.reshape(-1, self.num_classes),
            target_score.reshape(-1, 1),
            avg_factor=num_pos + B) * self.loss_cls_weight

        # loss_keypoint_reg: stride-normalized L1 at positive points
        # (reference ``keypoint_target:924`` + ``:500-516``)
        tgt_k = jnp.take_along_axis(
            gt_kpts, safe[..., None, None], axis=1)      # (B, N, K, 3)
        vis = (tgt_k[..., 2] > 0) & pos[..., None]
        tgt_off = (tgt_k[..., :2] - points[None, :, None, :]) \
            / strides_flat[None, :, None, None]
        pred_off = off_s.reshape(B, -1, K, 2)
        nvis = jnp.maximum(vis.sum().astype(jnp.float32) * 2, 1.0)
        losses["loss_keypoint_reg"] = (jnp.abs(pred_off - tgt_off)
                                       * vis[..., None]).sum() / nvis \
            * self.loss_offset_weight

        if self.with_hm:
            losses.update(self._heatmap_ae_offset_losses(
                hm_feats, gt_kpts, gt_boxes, gt_valid))
        losses["loss"] = sum(losses.values())
        return losses

    def _heatmap_ae_offset_losses(self, hm_feats, gt_kpts, gt_boxes,
                                  gt_valid, min_overlap_hm=0.9,
                                  max_hm_radius=3.0, min_overlap_kp=0.9,
                                  max_offset_radius=3.0, ae_weight=1.0):
        """Stride-4 heatmap branch losses (reference
        ``heatmap_ae_offset_loss``, ``inspose_head.py:929-1026``):
        CenterFocal on gaussian-splatted per-keypoint heatmaps,
        associative-embedding pull/push on the tag map at keypoint cells
        (incl. the reference's off-by-one ``gt_kp_int - 1`` indexing,
        kept for checkpoint behavioral parity), and nearest-keypoint
        short-range offset L1 (``draw_short_range_offset``)."""
        from ..losses.focal_loss import center_focal_loss
        hm_p = hm_feats["hm"]                            # (B, h4, w4, K)
        ae_p = hm_feats["ae"]
        off_p = hm_feats["offset"]                       # (B, h4, w4, 2K)
        B, h4, w4, K = hm_p.shape
        G = gt_boxes.shape[1]

        kp4 = gt_kpts[..., :2] / 4.0                     # (B, G, K, 2)
        kvalid = (gt_kpts[..., 2] > 0) & gt_valid[..., None]
        bw = (gt_boxes[..., 2] - gt_boxes[..., 0]) / 4.0
        bh = (gt_boxes[..., 3] - gt_boxes[..., 1]) / 4.0

        def in_jit_radius(h, w, min_overlap):
            # the reference's gaussian_radius (``opera/core/keypoint/
            # transforms.py:39-61`` — the ORIGINAL CornerNet formula with
            # all three roots divided by 2, not 2a; kept bug-for-bug)
            b1 = h + w
            c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
            sq1 = jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * c1, 0.0))
            r1 = (b1 + sq1) / 2
            b2 = 2 * (h + w)
            c2 = (1 - min_overlap) * w * h
            sq2 = jnp.sqrt(jnp.maximum(b2 ** 2 - 16 * c2, 0.0))
            r2 = (b2 + sq2) / 2
            b3 = -2 * min_overlap * (h + w)
            c3 = (min_overlap - 1) * w * h
            sq3 = jnp.sqrt(jnp.maximum(
                b3 ** 2 - 16 * min_overlap * c3, 0.0))
            r3 = (b3 + sq3) / 2
            return jnp.minimum(jnp.minimum(r1, r2), r3)

        r_hm = jnp.clip(jnp.floor(in_jit_radius(bh, bw, min_overlap_hm)),
                        0.0, max_hm_radius)              # (B, G)
        r_off = jnp.clip(jnp.floor(in_jit_radius(bh, bw, min_overlap_kp)),
                         0.0, max_offset_radius)

        xs = jnp.arange(w4, dtype=jnp.float32)
        ys = jnp.arange(h4, dtype=jnp.float32)
        kp_int = jnp.floor(kp4)                          # (B, G, K, 2)
        dxc = xs[None, None, None, :] - kp_int[..., 0][..., None]
        dyc = ys[None, None, None, :] - kp_int[..., 1][..., None]
        # (B, G, K, h4, w4) distances from each keypoint's int cell
        dx2 = dxc[:, :, :, None, :] ** 2
        dy2 = dyc[:, :, :, :, None] ** 2
        inbox = ((jnp.abs(dxc[:, :, :, None, :])
                  <= r_hm[..., None, None, None])
                 & (jnp.abs(dyc[:, :, :, :, None])
                    <= r_hm[..., None, None, None]))
        sigma = (2 * r_hm + 1) / 6.0                     # umich gaussian
        g = jnp.exp(-(dx2 + dy2)
                    / (2 * sigma[..., None, None, None] ** 2 + 1e-12))
        g = jnp.where(inbox & kvalid[..., None, None], g, 0.0)
        hm_target = g.max(1).transpose(0, 2, 3, 1)       # (B, h4, w4, K)
        p = jnp.clip(jax.nn.sigmoid(hm_p), 1e-4, 1 - 1e-4)
        loss_hm = center_focal_loss(p, hm_target) * self.loss_hm_weight

        # short-range offsets: exact (subpixel) gt minus cell index,
        # nearest keypoint wins inside the radius box
        ox = kp4[..., 0][..., None] - (
            kp_int[..., 0][..., None] + dxc)             # (B,G,K,w4)
        oy = kp4[..., 1][..., None] - (kp_int[..., 1][..., None] + dyc)
        d2o = (ox[:, :, :, None, :] ** 2 + oy[:, :, :, :, None] ** 2)
        inbox_o = ((jnp.abs(dxc[:, :, :, None, :])
                    <= r_off[..., None, None, None])
                   & (jnp.abs(dyc[:, :, :, :, None])
                      <= r_off[..., None, None, None])
                   & kvalid[..., None, None])
        d2o = jnp.where(inbox_o, d2o, jnp.inf)
        best = d2o.argmin(1)                             # (B, K, h4, w4)
        anyhit = jnp.isfinite(d2o.min(1))
        ox_b = jnp.take_along_axis(
            jnp.broadcast_to(ox[:, :, :, None, :],
                             d2o.shape), best[:, None], axis=1)[:, 0]
        oy_b = jnp.take_along_axis(
            jnp.broadcast_to(oy[:, :, :, :, None],
                             d2o.shape), best[:, None], axis=1)[:, 0]
        mask = anyhit.astype(jnp.float32)                # (B, K, h4, w4)
        tgt = jnp.stack([ox_b, oy_b], 2)                 # (B, K, 2, h4, w4)
        tgt = jnp.where(mask[:, :, None] > 0, tgt, 0.0)
        pred = off_p.transpose(0, 3, 1, 2).reshape(B, K, 2, h4, w4)
        m2 = jnp.repeat(mask[:, :, None], 2, 2)
        loss_hm_offset = (jnp.abs(pred * m2 - tgt * m2)).sum() \
            / (m2.sum() + 1e-4)

        # associative embedding pull/push on the tag map (reference's
        # gt_kp_int - 1 indexing replicated via torch-style wraparound)
        tx = jnp.mod(kp_int[..., 0].astype(jnp.int32) - 1, w4)
        ty = jnp.mod(kp_int[..., 1].astype(jnp.int32) - 1, h4)
        flat_idx = ty * w4 + tx                          # (B, G, K)
        ae_flat = ae_p.reshape(B, h4 * w4, K)
        tags_k = jnp.take_along_axis(
            ae_flat.transpose(0, 2, 1), flat_idx.transpose(0, 2, 1),
            axis=-1).transpose(0, 2, 1)                  # (B, G, K)
        kv = kvalid.astype(jnp.float32)
        nk = kv.sum(-1)                                  # (B, G)
        tag_mean = (tags_k * kv).sum(-1) / jnp.maximum(nk, 1.0)
        inst_ok = nk > 0                                 # (B, G)
        pull_g = ((tags_k - tag_mean[..., None]) ** 2 * kv).sum(-1) \
            / jnp.maximum(nk, 1.0)
        n_tags = inst_ok.sum(-1).astype(jnp.float32)     # (B,)
        pull = jnp.where(n_tags > 0,
                         (pull_g * inst_ok).sum(-1) / jnp.maximum(
                             n_tags, 1.0), 0.0)
        diff = tag_mean[:, :, None] - tag_mean[:, None, :]
        pairm = (inst_ok[:, :, None] & inst_ok[:, None, :]).astype(
            jnp.float32)
        push_m = (jnp.exp(-diff ** 2) * pairm).sum((-1, -2)) - n_tags
        push = jnp.where(n_tags > 1,
                         push_m / jnp.maximum(
                             n_tags * (n_tags - 1) * 2, 1.0), 0.0)
        return {"loss_heatmap": loss_hm,
                "loss_ae_pull": ae_weight * pull.mean(),
                "loss_ae_push": ae_weight * push.mean(),
                "loss_heatmap_offset": loss_hm_offset}

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
        # the instance heatmap; we fuse both estimates).  Coord-map
        # normalize is level-dependent: 2^lvl * 64 = 8 * stride_lvl
        # (reference ``get_coord_map`` call sites)
        norm = strd * (64.0 / self.strides[0])
        hm = self.dynamic_heatmaps(dyn, shared, pts, normalize=norm)
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
