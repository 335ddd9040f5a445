"""SOIT: Segmenting Objects with Instance-aware Transformers.

Rebuilds the reference SOIT stack (``opera/models/detectors/soit.py``,
``opera/models/dense_heads/soit_head.py``, ``SOITTransformer`` in
``opera/models/utils/transformer.py:24``, ``RelSinePositionalEncoding`` in
``opera/models/utils/positional_encoding.py:11``): a two-stage,
box-refining deformable-DETR detector whose decoder also emits, per query,
441 dynamic parameters that configure a per-instance deformable attention
over an 8-channel mask feature map (level-0 memory passed through a 1-layer
"seg encoder"), with a box-center-relative sine positional encoding.

TPU-first differences: per-instance mask prediction is vmapped over padded
GT/detection slots instead of python loops; dynamic 1x1-conv applications
are einsums over the per-instance parameter slices; everything is
static-shape in-jit.
"""
from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.resnet import ResNet
from ..necks.channel_mapper import ChannelMapper
from ..dense_heads.videopose_head import (
    EncoderLayer, inverse_sigmoid, bias_init_with_prob)
from ..layers.transformer import FFN, MLP, MultiheadAttention
from ..layers.positional_encoding import sine_positional_encoding
from ..attention.deformable import (
    MultiScaleDeformableAttention, make_sampling_locations)
from ..losses.focal_loss import sigmoid_focal_loss
from ...ops.lap import hungarian_masked
from ...ops.ms_deform_attn import ms_deform_attn

Shapes = Tuple[Tuple[int, int], ...]


# ---------------------------------------------------------------- box utils
def cxcywh_to_xyxy(b):
    cx, cy, w, h = jnp.split(b, 4, -1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                           -1)


def xyxy_to_cxcywh(b):
    x1, y1, x2, y2 = jnp.split(b, 4, -1)
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1)


def giou(boxes1, boxes2, eps=1e-7):
    """Generalized IoU on xyxy boxes, broadcasting (..., 4)."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = ((boxes1[..., 2] - boxes1[..., 0])
          * (boxes1[..., 3] - boxes1[..., 1]))
    a2 = ((boxes2[..., 2] - boxes2[..., 0])
          * (boxes2[..., 3] - boxes2[..., 1]))
    union = a1 + a2 - inter + eps
    iou = inter / union
    lt_e = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_e = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_e = jnp.clip(rb_e - lt_e, 0.0, None)
    enclose = wh_e[..., 0] * wh_e[..., 1] + eps
    return iou - (enclose - union) / enclose


def rel_sine_positional_encoding(mask, center, num_feats=4,
                                 temperature=10000.0, scale=2 * math.pi,
                                 eps=1e-6):
    """Box-center-relative sine PE (reference ``RelSinePositionalEncoding``).

    mask (h, w) bool (True = pad); center (2,) normalized cx, cy.
    Returns (h, w, 2*num_feats).
    """
    not_mask = (~mask).astype(jnp.float32)
    y = jnp.cumsum(not_mask, 0)
    x = jnp.cumsum(not_mask, 1)
    y = (y / (y[-1:, :] + eps) - center[1]) * scale
    x = (x / (x[:, -1:] + eps) - center[0]) * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])],
                   -1).reshape(*x.shape, num_feats)
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])],
                   -1).reshape(*y.shape, num_feats)
    return jnp.concatenate([py, px], -1)


def aligned_bilinear(x, factor: int):
    """CondInst's aligned upsample (reference ``soit_head.py:1040``):
    replicate-pad by 1, resize to (f*h+1, f*w+1) with align_corners=True,
    replicate-pad left/top by f//2, crop. x (..., h, w)."""
    h, w = x.shape[-2:]
    x = jnp.concatenate([x, x[..., -1:, :]], -2)
    x = jnp.concatenate([x, x[..., :, -1:]], -1)
    oh, ow = factor * h + 1, factor * w + 1
    # align_corners=True bilinear from (h+1, w+1)
    yy = jnp.arange(oh) * (h / (oh - 1))
    xx = jnp.arange(ow) * (w / (ow - 1))
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, w - 1)
    fy = (yy - y0)[..., :, None]
    fx = (xx - x0)[None, :]
    g = x[..., y0, :][..., :, x0]
    gy = x[..., y0 + 1, :][..., :, x0]
    gx = x[..., y0, :][..., :, x0 + 1]
    gyx = x[..., y0 + 1, :][..., :, x0 + 1]
    out = (g * (1 - fy) * (1 - fx) + gy * fy * (1 - fx)
           + gx * (1 - fy) * fx + gyx * fy * fx)
    pad = factor // 2
    out = jnp.concatenate([out[..., :1, :].repeat(pad, -2), out], -2)
    out = jnp.concatenate([out[..., :, :1].repeat(pad, -1), out], -1)
    return out[..., : oh - 1, : ow - 1]


# ------------------------------------------------------------ dynamic mask
DYN_SPLITS = dict(off_w=(0, 256), off_b=(256, 288), att_w=(288, 416),
                  att_b=(416, 432), out_w=(432, 440), out_b=(440, 441))


def dynamic_mask_attention(params, mask_feat, pos_embed, token_refs,
                           spatial_shape, key_padding_mask,
                           num_heads=4, num_points=4, impl="xla"):
    """Per-instance dynamic deformable attention over the mask feature.

    Reference ``DynamicDeformableAttention.forward``
    (``soit_head.py:768-1040``): the 441 params are the weights/biases of
    per-instance 1x1 convs for sampling offsets (8->32), attention weights
    (8->16) and the output logit projection (8->1).

    params (441,); mask_feat (n0, 8); pos_embed (n0, 8);
    token_refs (n0, 1, 2); key_padding_mask (n0,). Returns logits (n0,).
    """
    C = mask_feat.shape[-1]
    q = mask_feat + pos_embed
    s = DYN_SPLITS
    off_w = params[s["off_w"][0]:s["off_w"][1]].reshape(32, C)
    off_b = params[s["off_b"][0]:s["off_b"][1]]
    att_w = params[s["att_w"][0]:s["att_w"][1]].reshape(16, C)
    att_b = params[s["att_b"][0]:s["att_b"][1]]
    out_w = params[s["out_w"][0]:s["out_w"][1]].reshape(1, C)
    out_b = params[s["out_b"][0]:s["out_b"][1]]

    n0 = q.shape[0]
    offsets = (q @ off_w.T + off_b).reshape(
        1, n0, num_heads, 1, num_points, 2)
    weights = (q @ att_w.T + att_b).reshape(1, n0, num_heads, 1 * num_points)
    weights = jax.nn.softmax(weights, -1).reshape(
        1, n0, num_heads, 1, num_points)

    value = jnp.where(key_padding_mask[:, None], 0.0, mask_feat)
    value = value.reshape(1, n0, num_heads, C // num_heads)
    locations = make_sampling_locations(
        token_refs[None], offsets, (spatial_shape,), num_points)
    out = ms_deform_attn(value, (spatial_shape,), locations, weights,
                         impl=impl)[0]                     # (n0, C)
    out = nn.relu(out)
    return out @ out_w[0] + out_b[0]


# ---------------------------------------------------------------- detector
class SOITDetector(nn.Module):
    """SOIT R50 (reference ``configs/soit/soit_r50_16x2_50e_coco.py``)."""
    num_classes: int = 80
    num_query: int = 300
    max_gt: int = 30
    backbone_depth: int = 50
    # DK-DETR trains its backbone BN (``dkd_r50_70e_lvis.py:14`` SyncBN
    # requires_grad=True, norm_eval=False); SOIT keeps frozen BN
    norm_eval: bool = True
    embed_dims: int = 256
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    feedforward_channels: int = 1024
    num_heads: int = 8
    num_levels: int = 4
    mask_channels: int = 8
    dynamic_params_dims: int = 441
    max_per_img: int = 100
    # loss weights (reference config)
    loss_cls_weight: float = 2.0
    loss_bbox_weight: float = 5.0
    loss_iou_weight: float = 2.0
    dice_mask_loss_weight: float = 1.0
    bce_mask_loss_weight: float = 1.0
    cls_cost_weight: float = 2.0
    reg_cost_weight: float = 5.0
    iou_cost_weight: float = 2.0
    # DK-DETR (reference ``dkdetr_head.py``): decoder cls branches emit
    # text-embedding vectors scored by cosine similarity against per-class
    # text features (batch["text_feats"], (num_classes, cls_emb_dim)).
    cls_emb_dim: int = 0
    temperature: float = 1.0
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        C = self.embed_dims
        self.backbone = ResNet(depth=self.backbone_depth,
                               norm_eval=self.norm_eval,
                               out_indices=(1, 2, 3), dtype=self.dtype,
                               name="backbone")
        self.neck = ChannelMapper(out_channels=C, num_outs=self.num_levels,
                                  dtype=self.dtype, name="neck")
        self.encoder_layers = [
            EncoderLayer(embed_dims=C, num_heads=self.num_heads,
                         num_levels=self.num_levels,
                         feedforward_channels=self.feedforward_channels,
                         impl=self.impl, dtype=self.dtype,
                         name=f"encoder_layer{i}")
            for i in range(self.num_encoder_layers)]
        # the reference seg encoder runs SINGLE-head deformable attention
        # (``configs/soit/soit_r50_16x2_50e_coco.py:62`` num_heads=1)
        self.seg_encoder_layer = EncoderLayer(
            embed_dims=C, num_heads=1, num_levels=1,
            feedforward_channels=self.feedforward_channels, impl=self.impl,
            dtype=self.dtype, name="seg_encoder_layer")
        self.mask_trans = nn.Dense(self.mask_channels, dtype=self.dtype,
                                   name="mask_trans")
        self.mask_trans_norm = nn.LayerNorm(dtype=self.dtype,
                                            name="mask_trans_norm")
        self.level_embeds = self.param(
            "level_embeds", nn.initializers.normal(1.0),
            (self.num_levels, C))
        self.enc_output = nn.Dense(C, dtype=self.dtype, name="enc_output")
        self.enc_output_norm = nn.LayerNorm(dtype=self.dtype,
                                            name="enc_output_norm")
        # two-stage proposal embedding -> query content/pos
        self.pos_trans = nn.Dense(2 * C, dtype=self.dtype, name="pos_trans")
        self.pos_trans_norm = nn.LayerNorm(dtype=self.dtype,
                                           name="pos_trans_norm")

        self.dec_self_attns = [
            MultiheadAttention(C, self.num_heads, 0.1, dtype=self.dtype,
                               name=f"dec_self_attn{i}")
            for i in range(self.num_decoder_layers)]
        self.dec_cross_attns = [
            MultiScaleDeformableAttention(
                embed_dims=C, num_heads=self.num_heads,
                num_levels=self.num_levels, impl=self.impl,
                dtype=self.dtype, name=f"dec_cross_attn{i}")
            for i in range(self.num_decoder_layers)]
        self.dec_norms1 = [nn.LayerNorm(dtype=self.dtype,
                                        name=f"dec_norm1_{i}")
                           for i in range(self.num_decoder_layers)]
        self.dec_norms2 = [nn.LayerNorm(dtype=self.dtype,
                                        name=f"dec_norm2_{i}")
                           for i in range(self.num_decoder_layers)]
        self.dec_norms3 = [nn.LayerNorm(dtype=self.dtype,
                                        name=f"dec_norm3_{i}")
                           for i in range(self.num_decoder_layers)]
        self.dec_ffns = [FFN(C, self.feedforward_channels, dtype=self.dtype,
                             name=f"dec_ffn{i}")
                         for i in range(self.num_decoder_layers)]

        num_pred = self.num_decoder_layers + 1
        cls_bias = nn.initializers.constant(bias_init_with_prob(0.01))
        dec_out = self.cls_emb_dim or self.num_classes
        # the encoder-proposal branch (last) always scores num_classes
        # (reference ``dkdetr_head.py:_init_layers``)
        self.cls_branches = [
            nn.Dense(dec_out if i < num_pred - 1 else self.num_classes,
                     dtype=self.dtype, bias_init=cls_bias,
                     name=f"cls_branch{i}") for i in range(num_pred)]
        self.reg_branches = [
            MLP((C, C), 4, dtype=self.dtype, zero_init_last=True,
                name=f"reg_branch{i}") for i in range(num_pred)]
        self.seg_branches = [
            MLP((C, C), self.dynamic_params_dims, dtype=self.dtype,
                name=f"seg_branch{i}") for i in range(num_pred - 1)]

    # ------------------------------------------------------------ forward
    def _text_logits(self, emb, text_feats):
        """Cosine-similarity classification (reference
        ``dkdetr_head.get_cosine_similarity``)."""
        e = emb / jnp.clip(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-6, None)
        t = text_feats / jnp.clip(
            jnp.linalg.norm(text_feats, axis=-1, keepdims=True), 1e-6, None)
        return (e @ t.T) / self.temperature

    def forward_outputs(self, img, img_shape, deterministic=True,
                        text_feats=None):
        B, H, W, _ = img.shape
        feats = self.neck(self.backbone(img, train=not deterministic))
        shapes: Shapes = tuple((f.shape[1], f.shape[2]) for f in feats)
        from .videopose import VideoPoseDetector
        mlvl_masks, valid_ratios = VideoPoseDetector.level_masks(
            img_shape, (H, W), shapes)

        feat_flat, mask_flat, pos_flat = [], [], []
        C = self.embed_dims
        for lvl, (f, m) in enumerate(zip(feats, mlvl_masks)):
            h, w = shapes[lvl]
            feat_flat.append(f.reshape(B, h * w, C))
            mask_flat.append(m.reshape(B, h * w))
            pos = sine_positional_encoding(m, num_feats=C // 2,
                                           dtype=self.dtype)
            pos_flat.append(pos.reshape(B, h * w, C)
                            + self.level_embeds[lvl][None, None])
        x = jnp.concatenate(feat_flat, 1)
        mask = jnp.concatenate(mask_flat, 1)
        pos = jnp.concatenate(pos_flat, 1)

        from ..dense_heads.videopose_head import VideoPoseHead
        enc_ref = VideoPoseHead.encoder_reference_points(
            shapes, valid_ratios)
        for layer in self.encoder_layers:
            x = layer(x, pos, enc_ref, shapes, mask,
                      deterministic=deterministic)
        memory = x

        # mask feature: 1-layer seg encoder over level-0 memory
        n0 = shapes[0][0] * shapes[0][1]
        seg = self.seg_encoder_layer(
            memory[:, :n0], pos[:, :n0], enc_ref[:, :n0, :1],
            (shapes[0],), mask[:, :n0], deterministic=deterministic)
        mask_feat = self.mask_trans_norm(self.mask_trans(seg))  # (B,n0,8)

        # two-stage box proposals
        prop_logit, prop_valid = VideoPoseHead.gen_proposals(
            shapes,
            valid_ratios * jnp.asarray([[[w, h] for h, w in shapes]],
                                       jnp.float32), mask)
        out_mem = jnp.where(prop_valid[..., None], memory, 0.0)
        out_mem = self.enc_output_norm(self.enc_output(out_mem))
        enc_cls = self.cls_branches[-1](out_mem)
        enc_delta = self.reg_branches[-1](out_mem)
        # proposal wh = 0.05 * 2^lvl in sigmoid space (mmdet
        # ``gen_encoder_output_proposals``), logit-masked like the centers
        wh_rows = []
        for lvl, (hh, ww) in enumerate(shapes):
            p = 0.05 * (2.0 ** lvl)
            wh_rows.append(jnp.full((B, hh * ww, 2),
                                    math.log(p / (1 - p)), jnp.float32))
        wh_logit = jnp.concatenate(wh_rows, 1)
        wh_logit = jnp.where(prop_valid[..., None], wh_logit, 1e6)
        enc_coord_unact = enc_delta + jnp.concatenate(
            [prop_logit, wh_logit], -1)
        # mmdet's two-stage topk scores on the FIRST class logit
        # (``mmdet/models/utils/transformer.py`` DeformableDetrTransformer:
        # ``topk(enc_outputs_class[..., 0])``), not the max
        topk_scores = jnp.where(prop_valid, enc_cls[..., 0], -1e4)
        _, topk_idx = jax.lax.top_k(topk_scores, self.num_query)
        topk_coords = jax.lax.stop_gradient(jnp.take_along_axis(
            enc_coord_unact, topk_idx[..., None], axis=1))
        ref = jax.nn.sigmoid(topk_coords)                  # (B, Q, 4) cxcywh

        # query content/pos from proposal positional embedding; mmdet
        # hardcodes num_pos_feats=128 (valid only at embed 256: the
        # pos_trans input is 4*feats = 2*embed) — scale with embed_dims
        def proposal_pos_embed(coords, num_feats=self.embed_dims // 2,
                               temperature=10000):
            scale = 2 * math.pi
            dim_t = jnp.arange(num_feats, dtype=jnp.float32)
            dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
            p = jax.nn.sigmoid(coords) * scale
            pos = p[..., None] / dim_t
            pos = jnp.stack([jnp.sin(pos[..., 0::2]),
                             jnp.cos(pos[..., 1::2])], -1)
            return pos.reshape(*coords.shape[:-1], -1)

        pt = self.pos_trans_norm(self.pos_trans(
            proposal_pos_embed(topk_coords)))
        query_pos, query = jnp.split(pt, 2, -1)

        inter_cls, inter_coords, inter_dyn = [], [], []
        for lid in range(self.num_decoder_layers):
            query = self.dec_self_attns[lid](
                query, query_pos=query_pos, deterministic=deterministic)
            query = self.dec_norms1[lid](query)
            ref_input = (ref[:, :, None, :]
                         * jnp.concatenate([valid_ratios, valid_ratios],
                                           -1)[:, None])
            query = self.dec_cross_attns[lid](
                query, value=memory, reference_points=ref_input,
                spatial_shapes=shapes, key_padding_mask=mask,
                query_pos=query_pos, deterministic=deterministic)
            query = self.dec_norms2[lid](query)
            query = self.dec_ffns[lid](query, deterministic=deterministic)
            query = self.dec_norms3[lid](query)
            # box refinement (with_box_refine=True)
            delta = self.reg_branches[lid](query)
            new_ref = jax.nn.sigmoid(delta + inverse_sigmoid(ref))
            inter_cls.append(self.cls_branches[lid](query))
            inter_coords.append(new_ref)
            inter_dyn.append(self.seg_branches[lid](query))
            ref = jax.lax.stop_gradient(new_ref)

        if self.cls_emb_dim:
            assert text_feats is not None, "DK-DETR needs batch['text_feats']"
            inter_cls = [self._text_logits(c, text_feats)
                         for c in inter_cls]
        return dict(
            all_cls_scores=jnp.stack(inter_cls),
            all_bbox_preds=jnp.stack(inter_coords),   # cxcywh normalized
            all_dyn_params=jnp.stack(inter_dyn),
            enc_cls_scores=enc_cls,
            enc_bbox_preds=jax.nn.sigmoid(enc_coord_unact),
            mask_feat=mask_feat,
            mask_pad=mask[:, :n0],
            token_refs=enc_ref[:, :n0, :1],
            spatial_shapes=shapes,
            valid_ratios=valid_ratios,
        )

    def predict_masks(self, outs, dyn_params, centers,
                      deterministic=True):
        """Mask logits for per-image instance slots.

        dyn_params (B, M, 441); centers (B, M, 2) normalized cx,cy.
        Returns (B, M, h0, w0) logits.
        """
        h0, w0 = outs["spatial_shapes"][0]

        def per_instance(params, center, mask_feat, mask_pad, token_refs):
            pos = rel_sine_positional_encoding(
                mask_pad.reshape(h0, w0), center,
                num_feats=self.mask_channels // 2)
            logits = dynamic_mask_attention(
                params, mask_feat, pos.reshape(-1, self.mask_channels),
                token_refs, outs["spatial_shapes"][0], mask_pad,
                impl="xla")
            return logits.reshape(h0, w0)

        return jax.vmap(lambda p, c, mf, mp, tr: jax.vmap(
            lambda pp, cc: per_instance(pp, cc, mf, mp, tr))(p, c))(
                dyn_params, centers, outs["mask_feat"], outs["mask_pad"],
                outs["token_refs"])

    # ------------------------------------------------------------ matching
    def _assign(self, cls_logits, bbox_pred, gt_boxes_xyxy, gt_labels,
                gt_valid, img_shape):
        """Box Hungarian (FocalLossCost + BBoxL1Cost(xywh) + GIoUCost)."""
        h = img_shape[0].astype(jnp.float32)
        w = img_shape[1].astype(jnp.float32)
        factor = jnp.stack([w, h, w, h])
        gt_norm_xywh = xyxy_to_cxcywh(gt_boxes_xyxy / factor)
        p = jax.nn.sigmoid(cls_logits)
        neg = -jnp.log(1 - p + 1e-12) * 0.75 * p ** 2
        pos = -jnp.log(p + 1e-12) * 0.25 * (1 - p) ** 2
        cls_cost = (pos - neg)[:, gt_labels] * self.cls_cost_weight
        reg_cost = jnp.abs(bbox_pred[:, None] - gt_norm_xywh[None]).sum(
            -1) * self.reg_cost_weight
        iou_cost = -giou(cxcywh_to_xyxy(bbox_pred)[:, None] * factor,
                         gt_boxes_xyxy[None]) * self.iou_cost_weight
        cost = cls_cost + reg_cost + iou_cost
        cost = jnp.where(jnp.isfinite(cost), cost, 1e4)
        return hungarian_masked(jax.lax.stop_gradient(cost).T, gt_valid)

    # -------------------------------------------------------------- train
    def __call__(self, batch, train: bool = False):
        if train:
            return self.forward_train(batch)
        return self.forward_test(batch)

    def forward_train(self, batch):
        outs = self.forward_outputs(batch["img"], batch["img_shape"],
                                    deterministic=False,
                                    text_feats=batch.get("text_feats"))
        B, G = batch["gt_boxes"].shape[:2]
        losses = {}
        D = outs["all_cls_scores"].shape[0]
        h = batch["img_shape"][:, 0].astype(jnp.float32)
        w = batch["img_shape"][:, 1].astype(jnp.float32)
        factor = jnp.stack([w, h, w, h], -1)[:, None]      # (B,1,4)
        last_q = None
        for d in range(D):
            cls_s = outs["all_cls_scores"][d]
            box_p = outs["all_bbox_preds"][d]
            q_idx = jax.vmap(self._assign)(
                cls_s, box_p, batch["gt_boxes"], batch["gt_labels"],
                batch["gt_valid"], batch["img_shape"])
            prefix = "" if d == D - 1 else f"d{d}."
            losses.update(self._box_losses(
                prefix, cls_s, box_p, q_idx, batch, factor))
            if d == D - 1:
                last_q = q_idx

        # encoder (RPN) box losses with binary labels
        enc_q = jax.vmap(self._assign)(
            outs["enc_cls_scores"],
            xyxy_to_cxcywh(cxcywh_to_xyxy(outs["enc_bbox_preds"])),
            batch["gt_boxes"],
            jnp.zeros_like(batch["gt_labels"]), batch["gt_valid"],
            batch["img_shape"])
        losses.update(self._box_losses(
            "enc_", outs["enc_cls_scores"], outs["enc_bbox_preds"], enc_q,
            batch, factor, binary=True))

        # mask losses on last-layer matched slots
        safe = jnp.maximum(last_q, 0)
        dyn = jnp.take_along_axis(outs["all_dyn_params"][-1],
                                  safe[..., None], axis=1)   # (B,G,441)
        boxes = jnp.take_along_axis(outs["all_bbox_preds"][-1],
                                    safe[..., None], axis=1)
        centers = jax.lax.stop_gradient(boxes[..., :2])
        mask_logits = self.predict_masks(outs, dyn, centers,
                                         deterministic=False)
        up = aligned_bilinear(mask_logits, 4)
        preds = jax.nn.sigmoid(up)                         # (B,G,4h0,4w0)
        th, tw = preds.shape[-2:]
        gt_masks = jax.image.resize(
            batch["gt_masks"].astype(jnp.float32),
            (B, G, th, tw), method="bilinear")
        valid = batch["gt_valid"].astype(jnp.float32)      # (B, G)
        num_pos = jnp.maximum(valid.sum(), 1.0)
        inter = (preds * gt_masks).sum((-1, -2))
        denom = (preds ** 2).sum((-1, -2)) + (gt_masks ** 2).sum((-1, -2))
        dice = 1 - 2 * inter / jnp.clip(denom, 1e-6, None)
        losses["loss_mask_dice"] = (dice * valid).sum() / num_pos \
            * self.dice_mask_loss_weight
        bce = -(gt_masks * jnp.log(jnp.clip(preds, 1e-6, None))
                + (1 - gt_masks) * jnp.log(jnp.clip(1 - preds, 1e-6, None)))
        bce = bce.mean((-1, -2))
        losses["loss_mask_bce"] = (bce * valid).sum() / num_pos \
            * self.bce_mask_loss_weight
        losses["loss"] = sum(losses.values())
        return losses

    def _box_losses(self, prefix, cls_s, box_p, q_idx, batch, factor,
                    binary=False):
        B, Q = cls_s.shape[:2]
        G = batch["gt_boxes"].shape[1]
        valid = batch["gt_valid"]
        num_pos = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
        labels = jnp.full((B, Q), self.num_classes, jnp.int32)
        safe = jnp.where(valid, q_idx, Q)
        gt_lab = (jnp.zeros_like(batch["gt_labels"]) if binary
                  else batch["gt_labels"])
        labels = jax.vmap(
            lambda l, i, g: l.at[i].set(g.astype(jnp.int32), mode="drop"))(
                labels, safe, gt_lab)
        loss_cls = sigmoid_focal_loss(
            cls_s.reshape(-1, self.num_classes), labels.reshape(-1),
            avg_factor=num_pos) * self.loss_cls_weight
        pred = jnp.take_along_axis(box_p, jnp.maximum(q_idx, 0)[..., None],
                                   axis=1)                  # (B,G,4) cxcywh
        gt_xywh = xyxy_to_cxcywh(batch["gt_boxes"] / factor)
        wmask = valid[..., None].astype(jnp.float32)
        loss_bbox = (jnp.abs(pred - gt_xywh) * wmask).sum() / num_pos \
            * self.loss_bbox_weight
        g = giou(cxcywh_to_xyxy(pred) * factor, batch["gt_boxes"])
        loss_iou = ((1 - g) * valid).sum() / num_pos * self.loss_iou_weight
        return {f"{prefix}loss_cls": loss_cls,
                f"{prefix}loss_bbox": loss_bbox,
                f"{prefix}loss_iou": loss_iou}

    # ---------------------------------------------------------------- test
    def forward_test(self, batch):
        outs = self.forward_outputs(batch["img"], batch["img_shape"],
                                    deterministic=True,
                                    text_feats=batch.get("text_feats"))
        B = batch["img"].shape[0]
        M = self.max_per_img
        cls = jax.nn.sigmoid(outs["all_cls_scores"][-1])    # (B,Q,classes)
        flat = cls.reshape(B, -1)
        scores, idx = jax.lax.top_k(flat, M)
        q_idx = idx // self.num_classes
        labels = idx % self.num_classes
        boxes = jnp.take_along_axis(
            outs["all_bbox_preds"][-1], q_idx[..., None], axis=1)
        dyn = jnp.take_along_axis(
            outs["all_dyn_params"][-1], q_idx[..., None], axis=1)
        mask_logits = self.predict_masks(outs, dyn, boxes[..., :2])
        masks = jax.nn.sigmoid(aligned_bilinear(mask_logits, 4))
        h = batch["img_shape"][:, 0].astype(jnp.float32)[:, None, None]
        w = batch["img_shape"][:, 1].astype(jnp.float32)[:, None, None]
        factor = jnp.concatenate([w, h, w, h], -1)
        det = cxcywh_to_xyxy(boxes) * factor
        if "scale_factor" in batch:
            sf = batch["scale_factor"]
            det = det / jnp.concatenate([sf, sf], -1)[:, None]
        return dict(det_bboxes=jnp.concatenate([det, scores[..., None]], -1),
                    det_labels=labels, det_masks=masks)
