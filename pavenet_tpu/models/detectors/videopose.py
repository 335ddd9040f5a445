"""PAVE-Net detector: backbone + neck + video pose head + losses + test.

Rebuilds ``opera/models/detectors/videoposev1.py`` (thin DETR-style wrapper)
together with the loss assembly of
``opera/models/dense_heads/videopose_head_mul_frames.py:794-1306`` and the
inference post-processing (``:1371-1536``).  Everything — matching included —
runs inside one jitted apply over statically padded batches; with
``num_frames=1`` this is the PETR single-frame detector core.

Batch dict contract (all static shapes):
    img:          (B, T, H, W, 3) float32, normalized
    img_shape:    (B, 2) int32 (valid h, w) before padding
    scale_factor: (B, 2) float32 (w_scale, h_scale) test-time rescale
    gt_keypoints: (B, G, K, 3) xyv, unnormalized (train)
    gt_areas:     (B, G) float32 (train)
    gt_valid:     (B, G) bool (train)
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.resnet import ResNet
from ..necks.channel_mapper import ChannelMapper
from ..dense_heads.videopose_head import VideoPoseHead
from ..losses.focal_loss import sigmoid_focal_loss
from ..losses.oks_loss import OKS_SIGMAS
from ..losses.rle_loss import rle_loss
from ...core.assigner import pose_hungarian_assign, build_pose_targets
from ...ops.nms import oks_nms_keep, box_nms_keep

# canonical left/right keypoint pairs per keypoint count
# (reference dataset classes: ``opera/datasets/coco_pose.py:44``,
# ``posetrack_video_pose.py:52``, ``crowdpose_pose.py``)
FLIP_PAIRS_BY_K = {
    17: ((1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14),
         (15, 16)),
    15: ((3, 4), (5, 6), (7, 8), (9, 10), (11, 12), (13, 14)),
    14: ((0, 1), (2, 3), (4, 5), (6, 7), (8, 9), (10, 11)),
}


def _gaussian_radius(height, width, min_overlap=0.7):
    """CornerNet gaussian radius (reference
    ``opera/core/keypoint/transforms.py:39``; note the reference divides by
    2, not 2a — reproduced as-is)."""
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + safe_sqrt(b1 ** 2 - 4 * c1)) / 2
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + safe_sqrt(b2 ** 2 - 16 * c2)) / 2
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + safe_sqrt(b3 ** 2 - 16 * min_overlap * c3)) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


class VideoPoseDetector(nn.Module):
    """Flagship video model (production: T=3, K=15, R50, PoseTrack)."""
    num_frames: int = 3
    num_keypoints: int = 15
    num_classes: int = 1
    num_query: int = 300
    max_gt: int = 30
    backbone_type: str = "resnet"        # 'resnet' | 'swin' | 'hrnet'
    backbone_depth: int = 50
    backbone_out_indices: Tuple[int, ...] = (1, 2, 3)
    swin_embed_dims: int = 192           # Swin-L defaults
    swin_depths: Tuple[int, ...] = (2, 2, 18, 2)
    swin_num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    swin_window_size: int = 7
    hrnet_width: int = 48
    embed_dims: int = 256
    num_encoder_layers: int = 6
    num_decoder_layers: int = 3
    num_refine_layers: int = 2
    feedforward_channels: int = 1024
    dropout: float = 0.1
    max_per_img: int = 20
    oks_nms_thr: float = 0.45
    # loss configuration. Video production config
    # (``2025_2_13...posetrack17.py:113-137``): RLE losses, OKS/heatmap off,
    # Poseur rescoring + OKS-NMS at inference.  PETR
    # (``configs/petr/petr_r50_16x2_100e_coco.py``): L1 losses (70/70/80),
    # OKS 2.0 (refine 3.0), heatmap 4.0, no rescoring/NMS.
    kpt_loss: str = "rle"                # 'rle' | 'l1'
    with_rescoring: bool = True
    with_heatmap: bool = False
    with_nms: bool = True
    # PETR-vs-video architectural switches (see VideoPoseHead)
    query_from_encoder_token: bool = True
    detach_decoder_refs: bool = False
    # VideoPoseV2 (reference ``videoposev2.py:56-60``): backbone + neck
    # run under no_grad at train time (fine-tune the transformer only)
    freeze_backbone_neck: bool = False
    # mmdet ResNet freezing semantics (reference production: norm_eval
    # True, frozen_stages 1 — built for ImageNet-pretrained backbones).
    # From-scratch recipes (synthetic teacher) set norm_eval=False,
    # frozen_stages=-1: trainable BN + nothing frozen.  Consumed by the
    # ResNet module here and by build_optimizer/make_train_step (which
    # read them off the model).
    norm_eval: bool = True
    frozen_stages: int = 1
    loss_cls_weight: float = 0.5
    loss_kpt_weight: float = 1.0
    loss_kpt_rpn_weight: float = 1.0
    loss_kpt_refine_weight: float = 1.0
    loss_oks_weight: float = 0.0
    loss_oks_refine_weight: float = 0.0
    loss_hm_weight: float = 0.0
    cls_cost_weight: float = 2.0
    kpt_cost_weight: float = 70.0
    oks_cost_weight: float = 7.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    # 'deformable' (parity default) | 'windowed' (opt-in TPU-mode dense
    # local-attention encoder; see models/layers/windowed.py)
    encoder_mode: str = "deformable"
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.backbone_type == "swin":
            from ..backbones.swin import SwinTransformer
            self.backbone = SwinTransformer(
                embed_dims=self.swin_embed_dims, depths=self.swin_depths,
                num_heads=self.swin_num_heads,
                window_size=self.swin_window_size,
                out_indices=self.backbone_out_indices,
                dtype=self.dtype, name="backbone")
        elif self.backbone_type == "hrnet":
            from ..backbones.hrnet import HRNet
            self.backbone = HRNet(width=self.hrnet_width,
                                  dtype=self.dtype, name="backbone")
        else:
            self.backbone = ResNet(depth=self.backbone_depth,
                                   out_indices=self.backbone_out_indices,
                                   norm_eval=self.norm_eval,
                                   frozen_stages=self.frozen_stages,
                                   dtype=self.dtype, name="backbone")
        self.neck = ChannelMapper(out_channels=self.embed_dims, num_outs=4,
                                  dtype=self.dtype, name="neck")
        self.head = VideoPoseHead(
            num_classes=self.num_classes,
            num_frames=self.num_frames,
            num_keypoints=self.num_keypoints,
            num_query=self.num_query,
            embed_dims=self.embed_dims,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            num_refine_layers=self.num_refine_layers,
            feedforward_channels=self.feedforward_channels,
            dropout=self.dropout,
            with_heatmap=self.with_heatmap,
            query_from_encoder_token=self.query_from_encoder_token,
            detach_decoder_refs=self.detach_decoder_refs,
            encoder_mode=self.encoder_mode,
            impl=self.impl, dtype=self.dtype, name="head")

    # ------------------------------------------------------------------
    def extract_feats(self, img, train: bool = False):
        """(B, T, H, W, 3) -> list of (B, T, h, w, C) pyramid levels.

        Frame axis folded into batch through backbone+neck (reference
        ``mmdet/models/backbones/resnet.py:634-640``)."""
        B, T, H, W, _ = img.shape
        img = img.reshape(B * T, H, W, 3)
        x = (self.backbone(img, train=train)
             if self.backbone_type == "resnet" else self.backbone(img))
        if self.backbone_type == "hrnet":
            # HRNet emits all branch maps; PETR's neck takes the last 3
            x = [x[i] for i in self.backbone_out_indices]
        feats = self.neck(x)
        if self.freeze_backbone_neck:
            feats = [jax.lax.stop_gradient(f) for f in feats]
        return [f.reshape(B, T, *f.shape[1:]) for f in feats]

    @staticmethod
    def level_masks(img_shape, input_hw, level_shapes):
        """Per-level padding masks + valid ratios from valid image sizes.

        Nearest-downsample semantics of the reference's
        ``F.interpolate(img_masks)`` (``videopose_head_mul_frames.py:440``):
        level pixel (y, x) is valid iff y < img_h * h_l / H.
        Returns (mlvl_masks [(B,h,w) bool, True=pad], valid_ratios (B,L,2)).
        """
        H, W = input_hw
        img_h = img_shape[:, 0].astype(jnp.float32)
        img_w = img_shape[:, 1].astype(jnp.float32)
        masks, ratios = [], []
        for (h_l, w_l) in level_shapes:
            yy = jnp.arange(h_l, dtype=jnp.float32)[None, :]
            xx = jnp.arange(w_l, dtype=jnp.float32)[None, :]
            row_valid = yy < img_h[:, None] * h_l / H    # (B, h_l)
            col_valid = xx < img_w[:, None] * w_l / W    # (B, w_l)
            mask = ~(row_valid[:, :, None] & col_valid[:, None, :])
            masks.append(mask)
            ratios.append(jnp.stack(
                [col_valid.sum(-1) / w_l, row_valid.sum(-1) / h_l], -1))
        return masks, jnp.stack(ratios, 1)

    def forward_outputs(self, img, img_shape, deterministic=True,
                        return_heatmap=False):
        feats = self.extract_feats(img, train=not deterministic)
        level_shapes = tuple((f.shape[2], f.shape[3]) for f in feats)
        mlvl_masks, valid_ratios = self.level_masks(
            img_shape, img.shape[2:4], level_shapes)
        outs = self.head(feats, mlvl_masks, valid_ratios,
                         deterministic=deterministic,
                         return_heatmap=return_heatmap)
        outs["valid_ratios"] = valid_ratios
        return outs

    def refine_head(self, memory, mask_flatten, valid_ratios, ref_poses,
                    spatial_shapes):
        """Expose the joint decoder for apply(method=...) (parity tests,
        custom inference drivers)."""
        return self.head.forward_refine(
            memory, mask_flatten, valid_ratios, ref_poses,
            tuple(map(tuple, spatial_shapes)), deterministic=True)

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------
    def __call__(self, batch, train: bool = False):
        if train:
            return self.forward_train(batch)
        return self.forward_test(batch)

    def _assign_batch(self, cls_scores, kpt_preds, batch):
        """vmapped Hungarian matching for one prediction set."""
        K = self.num_keypoints

        def single(cls_s, kpt_p, gt_k, gt_a, gt_v, ishape):
            return pose_hungarian_assign(
                cls_s, kpt_p.reshape(-1, K, 2), gt_k, gt_a, gt_v, ishape,
                num_keypoints=K, cls_weight=self.cls_cost_weight,
                kpt_weight=self.kpt_cost_weight,
                oks_weight=self.oks_cost_weight)

        return jax.vmap(single)(
            cls_scores, kpt_preds, batch["gt_keypoints"],
            batch["gt_areas"], batch["gt_valid"], batch["img_shape"])

    def _targets(self, assign, batch, num_query):
        return jax.vmap(
            lambda a, k, ar, s: build_pose_targets(
                a, k, ar, s, num_query, self.num_classes))(
                    assign, batch["gt_keypoints"], batch["gt_areas"],
                    batch["img_shape"])

    def _gather_pos(self, preds, targets):
        """Gather per-GT-slot matched predictions: (B,Q,2K)->(B,G,K,2)."""
        B = preds.shape[0]
        K = self.num_keypoints
        idx = jnp.maximum(targets.query_idx, 0)
        return jnp.take_along_axis(
            preds.reshape(B, -1, K, 2), idx[..., None, None], axis=1)

    def _rle_layer_loss(self, flow, kpt_preds, sigma_preds, targets,
                        num_valid_kpt, weight):
        """Gather matched predictions per GT slot and apply the RLE loss."""
        B, K = kpt_preds.shape[0], self.num_keypoints
        pred = self._gather_pos(kpt_preds, targets)
        sigma = jnp.clip(self._gather_pos(sigma_preds, targets), 1e-4, None)
        w = targets.kpt_weights                           # (B, G, K, 2)
        bar_mu = jnp.where(w > 0, (pred - targets.kpt_targets) / sigma, 0.0)
        log_phi = flow.log_prob(bar_mu.reshape(-1, 2)).reshape(B, -1, K)
        return rle_loss(pred, sigma, targets.kpt_targets, w, log_phi,
                        num_valid_kpt, weight)

    @staticmethod
    def _l1_loss(pred, target, weights, num_valid_kpt, weight):
        """mmdet L1Loss with avg_factor=num_valid (reference PETR kpt loss).
        pred/target/weights (B, G, K, 2)."""
        return (jnp.abs(pred - target) * weights).sum() / num_valid_kpt \
            * weight

    def _oks_loss(self, pred, targets, batch, num_total_pos, weight):
        """OKS loss on matched pairs in absolute coordinates
        (reference ``loss_single`` OKS branch)."""
        from ..losses.oks_loss import oks_loss
        B, G = pred.shape[:2]
        h = batch["img_shape"][:, 0].astype(pred.dtype)[:, None, None, None]
        w = batch["img_shape"][:, 1].astype(pred.dtype)[:, None, None, None]
        factor = jnp.concatenate([w, h], -1)
        pos_valid = (targets.kpt_weights.sum((-1, -2)) > 0)   # (B, G)
        areas = jnp.maximum(targets.area_targets, 1e-6)
        return oks_loss(
            (pred * factor).reshape(B * G, -1),
            (targets.kpt_targets * factor).reshape(B * G, -1),
            targets.kpt_weights[..., 0].reshape(B * G, -1),
            areas.reshape(B * G),
            num_keypoints=self.num_keypoints,
            weight=pos_valid.reshape(B * G).astype(pred.dtype),
            avg_factor=jnp.maximum(num_total_pos, 1.0)) * weight

    def _kpt_layer_loss(self, flow, kpt_preds, sigma_preds, targets, batch,
                        num_valid_kpt, num_pos, kpt_weight, oks_weight):
        """Dispatch the configured keypoint regression loss; returns
        (loss_kpt, loss_oks or None)."""
        if self.kpt_loss == "rle":
            loss_kpt = self._rle_layer_loss(
                flow, kpt_preds, sigma_preds, targets, num_valid_kpt,
                kpt_weight)
        else:
            pred = self._gather_pos(kpt_preds, targets)
            loss_kpt = self._l1_loss(pred, targets.kpt_targets,
                                     targets.kpt_weights, num_valid_kpt,
                                     kpt_weight)
        loss_oks = None
        if oks_weight > 0:
            pred = self._gather_pos(kpt_preds, targets)
            loss_oks = self._oks_loss(pred, targets, batch, num_pos,
                                      oks_weight)
        return loss_kpt, loss_oks

    def _heatmap_loss(self, hm_pred, hm_mask, batch):
        """CornerNet-style heatmap loss on the level-0 map (reference
        ``petr_head.py:549`` ``loss_heatmap``: gt kpts at stride 8,
        gaussian radius from the gt *bbox* clamped to [0, 3], umich
        gaussian max-overlay).  Falls back to the keypoint envelope when
        the batch carries no ``gt_bboxes``."""
        from ..losses.focal_loss import center_focal_loss
        B, h0, w0, K = hm_pred.shape
        kpts = jnp.asarray(batch["gt_keypoints"])          # (B, G, K, 3)
        valid = (jnp.asarray(batch["gt_valid"])[:, :, None]
                 & (kpts[..., 2] > 0))                     # (B, G, K)
        if "gt_bboxes" in batch:
            bb = jnp.asarray(batch["gt_bboxes"])           # (B, G, 4) xyxy
            x1, y1, x2, y2 = bb[..., 0], bb[..., 1], bb[..., 2], bb[..., 3]
        else:
            vis = (kpts[..., 2] > 0).astype(jnp.float32)
            big = 1e9
            x1 = jnp.min(jnp.where(vis > 0, kpts[..., 0], big), -1)
            y1 = jnp.min(jnp.where(vis > 0, kpts[..., 1], big), -1)
            x2 = jnp.max(jnp.where(vis > 0, kpts[..., 0], -big), -1)
            y2 = jnp.max(jnp.where(vis > 0, kpts[..., 1], -big), -1)
        gw = jnp.clip((x2 - x1) / 8.0, 0.0, None)
        gh = jnp.clip((y2 - y1) / 8.0, 0.0, None)
        radius = jnp.clip(jnp.floor(_gaussian_radius(gh, gw, 0.9)),
                          0.0, 3.0)                        # (B, G)
        diameter = 2 * radius + 1
        sigma = diameter / 6.0

        cx = jnp.floor(kpts[..., 0] / 8.0)
        cy = jnp.floor(kpts[..., 1] / 8.0)
        ys = jnp.arange(h0, dtype=jnp.float32)
        xs = jnp.arange(w0, dtype=jnp.float32)

        def add_gt(g, target):
            dy = ys[None, None, :] - cy[:, g, :, None]     # (B, K, h0)
            dx = xs[None, None, :] - cx[:, g, :, None]     # (B, K, w0)
            r = radius[:, g, None, None, None]
            s2 = 2 * (sigma[:, g, None, None, None] ** 2) + 1e-12
            d2 = dy[..., :, None] ** 2 + dx[..., None, :] ** 2
            gsn = jnp.exp(-d2 / s2)
            inside = ((jnp.abs(dy[..., :, None]) <= r)
                      & (jnp.abs(dx[..., None, :]) <= r))
            gsn = jnp.where(
                inside & valid[:, g, :, None, None], gsn, 0.0)
            return jnp.maximum(target, gsn)

        target = jax.lax.fori_loop(
            0, kpts.shape[1], add_gt,
            jnp.zeros((B, K, h0, w0), jnp.float32))
        pred = jnp.clip(jax.nn.sigmoid(hm_pred), 1e-4, 1 - 1e-4)
        pred = pred.transpose(0, 3, 1, 2)                  # (B, K, h0, w0)
        mask = ~hm_mask                                    # (B, h0, w0)
        return center_focal_loss(
            pred.transpose(0, 2, 3, 1), target.transpose(0, 2, 3, 1),
            mask=mask) * self.loss_hm_weight

    def _cls_loss(self, cls_scores, labels, num_total_pos):
        avg = jnp.maximum(num_total_pos, 1.0)
        return sigmoid_focal_loss(
            cls_scores.reshape(-1, self.num_classes), labels.reshape(-1),
            gamma=self.focal_gamma, alpha=self.focal_alpha,
            avg_factor=avg) * self.loss_cls_weight

    def forward_train(self, batch):
        outs = self.forward_outputs(batch["img"], batch["img_shape"],
                                    deterministic=False,
                                    return_heatmap=self.with_heatmap)
        losses = {}
        last_targets = None

        # per-decoder-layer losses (reference ``loss_single:932``)
        D = outs["all_cls_scores"].shape[0]
        for d in range(D):
            cls_s = outs["all_cls_scores"][d]
            kpt_p = outs["all_kpt_preds"][d]
            sig_p = outs["all_sigma_preds"][d]
            assign = self._assign_batch(cls_s, kpt_p, batch)
            targets = self._targets(assign, batch, self.num_query)
            num_pos = targets.num_pos.sum()
            num_valid_kpt = jnp.maximum(targets.kpt_weights.sum(), 1.0)
            prefix = "" if d == D - 1 else f"d{d}."
            losses[prefix + "loss_cls"] = self._cls_loss(
                cls_s, targets.labels, num_pos)
            loss_kpt, loss_oks = self._kpt_layer_loss(
                self.head.dec_flow, kpt_p, sig_p, targets, batch,
                num_valid_kpt, num_pos, self.loss_kpt_weight,
                self.loss_oks_weight)
            losses[prefix + "loss_kpt"] = loss_kpt
            if loss_oks is not None:
                losses[prefix + "loss_oks"] = loss_oks
            if d == D - 1:
                last_targets = targets

        # encoder (RPN) losses over all tokens
        # (reference ``loss_single_rpn:1199``; no OKS term)
        enc_assign = self._assign_batch(
            outs["enc_cls_scores"], outs["enc_kpt_preds"], batch)
        enc_targets = self._targets(
            enc_assign, batch, outs["enc_cls_scores"].shape[1])
        enc_num_pos = enc_targets.num_pos.sum()
        enc_valid_kpt = jnp.maximum(enc_targets.kpt_weights.sum(), 1.0)
        losses["enc_loss_cls"] = self._cls_loss(
            outs["enc_cls_scores"], enc_targets.labels, enc_num_pos)
        losses["enc_loss_kpt"], _ = self._kpt_layer_loss(
            self.head.enc_flow, outs["enc_kpt_preds"],
            outs["enc_sigma_preds"], enc_targets, batch, enc_valid_kpt,
            enc_num_pos, self.loss_kpt_rpn_weight, 0.0)

        if self.with_heatmap and self.loss_hm_weight > 0:
            losses["loss_hm"] = self._heatmap_loss(
                outs["hm_pred"], outs["hm_mask"], batch)

        # joint-decoder refinement losses on matched poses
        # (reference ``forward_refine:569-742``)
        B = batch["img"].shape[0]
        K = self.num_keypoints
        idx = jnp.maximum(last_targets.query_idx, 0)      # (B, G)
        frame_preds = outs["frame_kpt_preds"]             # (B, T, Q, 2K)
        ref_poses = jnp.take_along_axis(
            frame_preds, idx[:, None, :, None], axis=2)   # (B, T, G, 2K)
        ref_poses = jax.lax.stop_gradient(
            ref_poses.transpose(0, 2, 1, 3))              # (B, G, T, 2K)
        refine_kpts, _, refine_sigmas = self.head.forward_refine(
            outs["memory"], outs["mask_flatten"], outs["valid_ratios"],
            ref_poses, outs["spatial_shapes"], deterministic=False)
        num_valid_kpt = jnp.maximum(last_targets.kpt_weights.sum(), 1.0)
        num_pos = last_targets.num_pos.sum()
        for r in range(refine_kpts.shape[0]):
            pred = refine_kpts[r]                         # (B, G, K, 2)
            w = last_targets.kpt_weights
            if self.kpt_loss == "rle":
                sigma = jnp.clip(refine_sigmas[r], 1e-4, None)
                bar_mu = jnp.where(
                    w > 0, (pred - last_targets.kpt_targets) / sigma, 0.0)
                log_phi = self.head.flow.log_prob(
                    bar_mu.reshape(-1, 2)).reshape(B, -1, K)
                losses[f"d{r}.loss_kpt_refine"] = rle_loss(
                    pred, sigma, last_targets.kpt_targets, w, log_phi,
                    num_valid_kpt, self.loss_kpt_refine_weight)
            else:
                losses[f"d{r}.loss_kpt_refine"] = self._l1_loss(
                    pred, last_targets.kpt_targets, w, num_valid_kpt,
                    self.loss_kpt_refine_weight)
            if self.loss_oks_refine_weight > 0:
                losses[f"d{r}.loss_oks_refine"] = self._oks_loss(
                    pred, last_targets, batch, num_pos,
                    self.loss_oks_refine_weight)

        losses["loss"] = sum(losses.values())
        return losses

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------
    def forward_test(self, batch, rescale: bool = True,
                     with_nms: bool | None = None):
        """Returns padded detections per image:
        det_kpts (B, M, K, 3), det_bboxes (B, M, 5), keep (B, M)."""
        if with_nms is None:
            with_nms = self.with_nms
        outs = self.forward_outputs(batch["img"], batch["img_shape"],
                                    deterministic=True)
        B = batch["img"].shape[0]
        K = self.num_keypoints
        M = self.max_per_img

        cls_score = jax.nn.sigmoid(outs["all_cls_scores"][-1][..., 0])
        scores, bbox_index = jax.lax.top_k(cls_score, M)   # (B, M)

        frame_preds = outs["frame_kpt_preds"]              # (B, T, Q, 2K)
        ref_poses = jnp.take_along_axis(
            frame_preds, bbox_index[:, None, :, None], axis=2)
        ref_poses = ref_poses.transpose(0, 2, 1, 3)        # (B, M, T, 2K)

        refine_kpts, refine_scores, refine_sigmas = self.head.forward_refine(
            outs["memory"], outs["mask_flatten"], outs["valid_ratios"],
            jax.lax.stop_gradient(ref_poses), outs["spatial_shapes"],
            deterministic=True)
        det_kpts = refine_kpts[-1]                         # (B, M, K, 2)
        det_sigmas = refine_sigmas[-1]                     # (B, M, K, 2)

        img_h = batch["img_shape"][:, 0].astype(jnp.float32)[:, None, None]
        img_w = batch["img_shape"][:, 1].astype(jnp.float32)[:, None, None]
        x = jnp.clip(det_kpts[..., 0] * img_w, 0, img_w)
        y = jnp.clip(det_kpts[..., 1] * img_h, 0, img_h)
        det_kpts = jnp.stack([x, y], -1)
        if rescale:
            det_kpts = det_kpts / batch["scale_factor"][:, None, None, :]

        # circumscribed-rectangle boxes
        x1 = det_kpts[..., 0].min(-1)
        y1 = det_kpts[..., 1].min(-1)
        x2 = det_kpts[..., 0].max(-1)
        y2 = det_kpts[..., 1].max(-1)
        det_bboxes = jnp.stack([x1, y1, x2, y2, scores], -1)

        if self.with_rescoring:
            # Poseur-style rescoring (reference ``get_p:1531``, constants
            # p_x=0.2, *0.7, power 5 at ``:1466-1491``)
            p = 1.0 - jnp.exp(-(0.2 / jnp.clip(det_sigmas, 1e-6, None)))
            p = (p[..., 0] * p[..., 1])[..., None] * 0.7   # (B, M, K, 1)
            det_kpts = det_kpts * (p ** 5) / (p ** 5 + 1e-10)
            kpt_scores = scores[:, :, None, None] * p      # (B, M, K, 1)
        else:
            # PETR: unit per-keypoint scores (``petr_head.py:1040``)
            kpt_scores = jnp.ones((*det_kpts.shape[:3], 1), det_kpts.dtype)
        det_kpts = jnp.concatenate([det_kpts, kpt_scores], -1)

        if with_nms:
            sigmas = jnp.asarray(OKS_SIGMAS[K])
            areas = ((det_kpts[..., 0].max(-1) - det_kpts[..., 0].min(-1))
                     * (det_kpts[..., 1].max(-1) - det_kpts[..., 1].min(-1)))
            keep = jax.vmap(
                lambda k, s, a: oks_nms_keep(
                    k[..., :2], s, a, sigmas, self.oks_nms_thr))(
                        det_kpts, scores, areas)
        else:
            keep = jnp.ones((B, M), bool)
        return dict(det_kpts=det_kpts, det_bboxes=det_bboxes,
                    det_labels=jnp.zeros((B, M), jnp.int32), keep=keep)

    # ------------------------------------------------------------------
    # test-time flip augmentation
    # ------------------------------------------------------------------
    def _flip_images(self, batch):
        """Horizontal flip inside each sample's *valid* width (images are
        right/bottom padded to the bucket, so a plain W-flip would move
        content into the padding)."""
        img = batch["img"]                                 # (B, T, H, W, 3)
        W = img.shape[3]
        img_w = batch["img_shape"][:, 1]
        xs = jnp.arange(W)
        src = jnp.where(xs[None, :] < img_w[:, None],
                        img_w[:, None] - 1 - xs[None, :], xs[None, :])
        flipped = jnp.take_along_axis(
            img, src[:, None, None, :, None], axis=3)
        return dict(batch, img=flipped)

    def forward_test_flip(self, batch, rescale: bool = True,
                          score_thr: float = 0.0, nms_iou: float = 0.7):
        """Flip test-time augmentation: merge original + flipped-image
        detections, box-NMS the union (reference ``aug_test``,
        ``opera/models/detectors/videoposev1.py:224-262`` with
        ``kpt_mapping_back`` flip-merge and ``multiclass_nms``; PETR twin
        ``petr.py:150``).  Same output contract as ``forward_test`` —
        padded detections + keep mask, top ``max_per_img`` overall."""
        K, M = self.num_keypoints, self.max_per_img
        out = self.forward_test(batch, rescale=rescale, with_nms=False)
        out_f = self.forward_test(self._flip_images(batch),
                                  rescale=rescale, with_nms=False)

        # map flipped detections back to original orientation
        img_w = batch["img_shape"][:, 1].astype(jnp.float32)
        ori_w = img_w / batch["scale_factor"][:, 0] if rescale else img_w
        kpts_f = out_f["det_kpts"]                         # (B, M, K, 3)
        x_back = ori_w[:, None, None] - kpts_f[..., 0]
        kpts_f = jnp.concatenate(
            [x_back[..., None], kpts_f[..., 1:]], -1)
        perm = list(range(K))
        for a, b in FLIP_PAIRS_BY_K.get(K, ()):
            perm[a], perm[b] = perm[b], perm[a]
        kpts_f = kpts_f[:, :, jnp.asarray(perm), :]

        kpts = jnp.concatenate([out["det_kpts"], kpts_f], 1)  # (B, 2M, K, 3)
        scores = jnp.concatenate(
            [out["det_bboxes"][..., 4], out_f["det_bboxes"][..., 4]], 1)
        x1 = kpts[..., 0].min(-1)
        y1 = kpts[..., 1].min(-1)
        x2 = kpts[..., 0].max(-1)
        y2 = kpts[..., 1].max(-1)
        boxes = jnp.stack([x1, y1, x2, y2], -1)            # (B, 2M, 4)

        keep = jax.vmap(lambda b, s: box_nms_keep(b, s, nms_iou, score_thr))(
            boxes, scores)
        # cap at max_per_img by score among kept
        ranked = jnp.where(keep, scores, -jnp.inf)
        top_scores, top_idx = jax.lax.top_k(ranked, M)     # (B, M)
        take = lambda a: jnp.take_along_axis(
            a, top_idx.reshape(*top_idx.shape, *(1,) * (a.ndim - 2)), axis=1)
        det_kpts = take(kpts)
        # merged keypoint scores reset to 1 (reference ``videoposev1.py:255``)
        det_kpts = jnp.concatenate(
            [det_kpts[..., :2], jnp.ones_like(det_kpts[..., :1])], -1)
        det_bboxes = jnp.concatenate(
            [take(boxes), top_scores[..., None]], -1)
        return dict(det_kpts=det_kpts, det_bboxes=det_bboxes,
                    det_labels=jnp.zeros(top_idx.shape, jnp.int32),
                    keep=jnp.isfinite(top_scores))

    def forward_test_aug(self, batch, flip: bool = False,
                         rescale: bool = True):
        """One test-time-augmentation pass: padded detections in ORIGINAL
        image coordinates, no NMS (one element of the reference
        ``aug_test`` list, ``videoposev1.py:224-246``).  ``flip`` runs the
        horizontally flipped image and maps keypoints back
        (``kpt_mapping_back`` semantics).  Merge passes with
        ``merge_aug_detections``."""
        K = self.num_keypoints
        if not flip:
            out = self.forward_test(batch, rescale=rescale, with_nms=False)
            return dict(det_kpts=out["det_kpts"],
                        scores=out["det_bboxes"][..., 4])
        out_f = self.forward_test(self._flip_images(batch),
                                  rescale=rescale, with_nms=False)
        img_w = batch["img_shape"][:, 1].astype(jnp.float32)
        ori_w = img_w / batch["scale_factor"][:, 0] if rescale else img_w
        kpts_f = out_f["det_kpts"]                         # (B, M, K, 3)
        x_back = ori_w[:, None, None] - kpts_f[..., 0]
        kpts_f = jnp.concatenate([x_back[..., None], kpts_f[..., 1:]], -1)
        perm = list(range(K))
        for a, b in FLIP_PAIRS_BY_K.get(K, ()):
            perm[a], perm[b] = perm[b], perm[a]
        kpts_f = kpts_f[:, :, jnp.asarray(perm), :]
        return dict(det_kpts=kpts_f, scores=out_f["det_bboxes"][..., 4])

    def merge_aug_detections(self, outs, score_thr: float = 0.0,
                             nms_iou: float = 0.7):
        """Merge a list of ``forward_test_aug`` outputs: union -> box NMS
        -> top ``max_per_img`` (reference ``merge_aug_results`` +
        ``multiclass_nms``, ``videoposev1.py:224-262``).  Same output
        contract as ``forward_test``."""
        M = self.max_per_img
        kpts = jnp.concatenate([o["det_kpts"] for o in outs], 1)
        scores = jnp.concatenate([o["scores"] for o in outs], 1)
        x1 = kpts[..., 0].min(-1)
        y1 = kpts[..., 1].min(-1)
        x2 = kpts[..., 0].max(-1)
        y2 = kpts[..., 1].max(-1)
        boxes = jnp.stack([x1, y1, x2, y2], -1)            # (B, nM, 4)
        keep = jax.vmap(lambda b, s: box_nms_keep(b, s, nms_iou, score_thr))(
            boxes, scores)
        ranked = jnp.where(keep, scores, -jnp.inf)
        top_scores, top_idx = jax.lax.top_k(ranked, M)     # (B, M)
        take = lambda a: jnp.take_along_axis(
            a, top_idx.reshape(*top_idx.shape, *(1,) * (a.ndim - 2)), axis=1)
        det_kpts = take(kpts)
        # merged keypoint scores reset to 1 (reference ``videoposev1.py:255``)
        det_kpts = jnp.concatenate(
            [det_kpts[..., :2], jnp.ones_like(det_kpts[..., :1])], -1)
        det_bboxes = jnp.concatenate(
            [take(boxes), top_scores[..., None]], -1)
        return dict(det_kpts=det_kpts, det_bboxes=det_bboxes,
                    det_labels=jnp.zeros(top_idx.shape, jnp.int32),
                    keep=jnp.isfinite(top_scores))
