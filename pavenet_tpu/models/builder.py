"""Config -> model construction.

Keeps the reference's config surface (``opera/models/builder.py``: a
``model = dict(type='opera.VideoPoseV1', backbone=..., bbox_head=...)``
dict) while mapping onto the collapsed flax architecture.  The mm-style
nested component configs are translated to detector hyperparameters;
unknown experimental knobs raise rather than silently drift.

Recipe mapping rules (checked against the reference configs):

- ``bbox_head.loss_kpt.type`` picks the keypoint loss family
  (``opera.RLELoss`` -> 'rle', ``mmdet.L1Loss`` -> 'l1'); all per-loss
  weights flow through (``configs/petr/petr_r50_16x2_100e_coco.py:103-114``
  vs ``configs/videopose/2025-2-13/...posetrack17.py:119-131``).
- Poseur rescoring + OKS-NMS are baked into the *video* head's inference
  (``videopose_head_mul_frames.py:1466-1504``) and absent from PETR's
  (``petr_head.py:896``), so they key off the head type.
- The heatmap branch exists in both transformers (``hm_encoder``) but its
  loss weight is 0.0 in the video production config — ``with_heatmap``
  follows the loss weight.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..registry import MODELS, split_scope_key
from .detectors.videopose import VideoPoseDetector


def _type_name(cfg, default=None):
    if cfg is None:
        return default
    return split_scope_key(cfg.get("type", default))[1]


def _backbone_kwargs(backbone: dict) -> dict:
    """Map a reference backbone config to detector kwargs."""
    btype = _type_name(backbone, "ResNet")
    if btype == "ResNet":
        return dict(
            backbone_type="resnet",
            backbone_depth=backbone.get("depth", 50),
            backbone_out_indices=tuple(
                backbone.get("out_indices", (1, 2, 3))),
            norm_eval=backbone.get("norm_eval", True),
            frozen_stages=backbone.get("frozen_stages", 1))
    if btype == "HRNet":
        stage4 = backbone.get("extra", {}).get("stage4", {})
        width = stage4.get("num_channels", (48,))[0]
        return dict(backbone_type="hrnet", hrnet_width=width,
                    backbone_out_indices=(1, 2, 3))
    if btype == "SwinTransformer":
        return dict(
            backbone_type="swin",
            backbone_out_indices=tuple(
                backbone.get("out_indices", (1, 2, 3))),
            swin_embed_dims=backbone.get("embed_dims", 192),
            swin_depths=tuple(backbone.get("depths", (2, 2, 18, 2))),
            swin_num_heads=tuple(
                backbone.get("num_heads", (6, 12, 24, 48))),
            swin_window_size=backbone.get("window_size", 7))
    raise KeyError(f"unsupported backbone {btype!r}")


def _loss_weight(head, key, default=0.0):
    return head.get(key, {}).get("loss_weight", default)


_DTYPE_NAMES = {
    "f32": jnp.float32, "float32": jnp.float32, "fp32": jnp.float32,
    "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
}


def resolve_act_dtype(cfg, override: Optional[str] = None):
    """Activation/compute dtype for the model, as a CLI-facing policy.

    ``override`` ('f32'/'bf16') wins; 'auto'/None falls back to the
    config's top-level ``act_dtype`` key, then float32.  float32 is the
    parity default (the reference runs fp32 end to end unless its mmcv
    ``fp16`` hook is configured); 'bf16' is the TPU deployment mode the
    headline bench numbers use (MXU-native, ~3x faster at the flagship
    bucket — PERF_NOTES "Round 5: eval CLI act dtype").
    """
    if override and override != "auto":
        return _DTYPE_NAMES[override]
    name = (cfg or {}).get("act_dtype", "float32")
    return _DTYPE_NAMES[str(name)]


def build_detector(cfg: dict, train_cfg: Optional[dict] = None,
                   test_cfg: Optional[dict] = None,
                   dtype=jnp.float32):
    """Build a detector from a reference-style model config dict."""
    cfg = dict(cfg)
    det_type = _type_name(cfg)
    if det_type in ("SOIT", "DKDETR"):
        return _build_soit(cfg, train_cfg, test_cfg, dtype)
    if det_type == "InsPose":
        return _build_inspose(cfg, train_cfg, test_cfg, dtype)
    if det_type not in ("VideoPoseV1", "VideoPoseV2", "PETR"):
        raise KeyError(f"unsupported detector type {det_type!r}")

    head = cfg.get("bbox_head", {})
    head_type = _type_name(head, "PETRHead" if det_type == "PETR"
                           else "VideoPoseHeadMulFrames")
    transformer = head.get("transformer", {})
    encoder = transformer.get("encoder", {})
    enc_layers = encoder.get("transformerlayers", {})
    decoder = transformer.get("decoder", {})
    refine = transformer.get("refine_decoder", {})
    train_cfg = train_cfg if train_cfg is not None else cfg.get("train_cfg")
    test_cfg = test_cfg if test_cfg is not None else cfg.get("test_cfg")
    test_cfg = test_cfg or {}

    def cost_weight(name, default):
        if not train_cfg:
            return default
        return train_cfg.get("assigner", {}).get(name, {}).get(
            "weight", default)

    is_petr = head_type == "PETRHead"
    num_frames = head.get("num_frames", 1 if is_petr else 3)
    kpt_loss_type = _type_name(head.get("loss_kpt"),
                               "L1Loss" if is_petr else "RLELoss")
    kpt_loss = {"RLELoss": "rle", "L1Loss": "l1"}.get(kpt_loss_type)
    if kpt_loss is None:
        raise KeyError(f"unsupported loss_kpt type {kpt_loss_type!r}")
    loss_hm_weight = _loss_weight(head, "loss_hm", 0.0)

    kwargs = dict(
        num_frames=num_frames,
        num_keypoints=head.get("num_keypoints", 17 if is_petr else 15),
        num_classes=head.get("num_classes", 1),
        num_query=head.get("num_query", 300),
        embed_dims=enc_layers.get("attn_cfgs", {}).get("embed_dims", 256),
        feedforward_channels=enc_layers.get("feedforward_channels", 1024),
        num_encoder_layers=encoder.get("num_layers", 6),
        num_decoder_layers=decoder.get("num_layers", 3),
        num_refine_layers=refine.get("num_layers", 2),
        # opt-in TPU-mode encoder (dense window attention); config key
        # model.bbox_head.transformer.encoder.mode='windowed'
        encoder_mode=encoder.get("mode", "deformable"),
        kpt_loss=kpt_loss,
        with_heatmap=loss_hm_weight > 0,
        # PETR: pure learnable queries + per-layer reference detach
        # (``transformer.py:4604-4607``, ``:4222``); video: topk-token
        # queries, no detach (``:21399-21403``, ``:6729-6746``)
        query_from_encoder_token=not is_petr,
        detach_decoder_refs=is_petr,
        # VideoPoseV2 trains with backbone+neck frozen
        # (``videoposev2.py:56-60``)
        freeze_backbone_neck=det_type == "VideoPoseV2",
        # rescoring + OKS-NMS live in the video head's get_bboxes only
        with_rescoring=test_cfg.get("with_rescoring", not is_petr),
        with_nms=test_cfg.get("with_nms", not is_petr),
        loss_cls_weight=_loss_weight(head, "loss_cls", 0.5),
        loss_kpt_weight=_loss_weight(head, "loss_kpt", 1.0),
        loss_kpt_rpn_weight=_loss_weight(head, "loss_kpt_rpn", 1.0),
        loss_kpt_refine_weight=_loss_weight(head, "loss_kpt_refine", 1.0),
        loss_oks_weight=_loss_weight(head, "loss_oks", 0.0),
        loss_oks_refine_weight=_loss_weight(head, "loss_oks_refine", 0.0),
        loss_hm_weight=loss_hm_weight,
        cls_cost_weight=cost_weight("cls_cost", 2.0),
        kpt_cost_weight=cost_weight("kpt_cost", 70.0),
        oks_cost_weight=cost_weight("oks_cost", 7.0),
        max_per_img=test_cfg.get("max_per_img", 100),
        dtype=dtype,
    )
    kwargs.update(_backbone_kwargs(cfg.get("backbone", {})))
    return VideoPoseDetector(**kwargs)


def _build_soit(cfg, train_cfg, test_cfg, dtype):
    from .detectors.soit import SOITDetector
    head = cfg.get("bbox_head", {})
    backbone = cfg.get("backbone", {})
    if _type_name(backbone, "ResNet") != "ResNet":
        raise KeyError("SOIT rebuild supports ResNet backbones only")
    transformer = head.get("transformer", {})
    train_cfg = train_cfg if train_cfg is not None else cfg.get("train_cfg")
    test_cfg = test_cfg if test_cfg is not None else cfg.get("test_cfg", {})

    def cost_weight(name, default):
        if not train_cfg:
            return default
        return train_cfg.get("assigner", {}).get(name, {}).get(
            "weight", default)

    # DK-DETR (``dkd_r50_70e_lvis.py``): cosine text-embedding cls
    # branches (text_encoder.text_dim, temperature) + trainable backbone
    # BN (SyncBN requires_grad=True, norm_eval=False -> norm_eval=False;
    # the cross-device stat sync falls out of the pjit-sharded batch axis)
    dk_kwargs = {}
    if _type_name(cfg) == "DKDETR":
        text_enc = cfg.get("text_encoder", {})
        dk_kwargs = dict(
            cls_emb_dim=text_enc.get("text_dim", 512),
            temperature=cfg.get("temperature", 0.05))

    enc_layers = transformer.get("encoder", {}).get("transformerlayers", {})
    return SOITDetector(
        norm_eval=backbone.get("norm_eval", True),
        **dk_kwargs,
        num_classes=head.get("num_classes", 80),
        num_query=head.get("num_query", 300),
        max_gt=head.get("max_gt", 30),
        backbone_depth=backbone.get("depth", 50),
        embed_dims=enc_layers.get("attn_cfgs", {}).get("embed_dims", 256),
        feedforward_channels=enc_layers.get("feedforward_channels", 1024),
        num_encoder_layers=transformer.get("encoder", {}).get(
            "num_layers", 6),
        num_decoder_layers=transformer.get("decoder", {}).get(
            "num_layers", 6),
        mask_channels=transformer.get("mask_channels", 8),
        dynamic_params_dims=head.get("dynamic_params_dims", 441),
        loss_cls_weight=_loss_weight(head, "loss_cls", 2.0),
        loss_bbox_weight=_loss_weight(head, "loss_bbox", 5.0),
        loss_iou_weight=_loss_weight(head, "loss_iou", 2.0),
        dice_mask_loss_weight=head.get("dice_mask_loss_weight", 8.0),
        bce_mask_loss_weight=head.get("bce_mask_loss_weight", 2.0),
        cls_cost_weight=cost_weight("cls_cost", 2.0),
        reg_cost_weight=cost_weight("reg_cost", 5.0),
        iou_cost_weight=cost_weight("iou_cost", 2.0),
        max_per_img=(test_cfg or {}).get("max_per_img", 100),
        dtype=dtype)


def _build_inspose(cfg, train_cfg, test_cfg, dtype):
    from .detectors.inspose import InsPoseDetector
    head = cfg.get("bbox_head", {})
    backbone = cfg.get("backbone", {})
    if _type_name(backbone, "ResNet") != "ResNet":
        raise KeyError("InsPose rebuild supports ResNet backbones only")
    test_cfg = test_cfg if test_cfg is not None else cfg.get("test_cfg", {})
    return InsPoseDetector(
        num_classes=head.get("num_classes", 1),
        num_keypoints=head.get("num_keypoints", 17),
        backbone_depth=backbone.get("depth", 50),
        feat_channels=head.get("feat_channels", 256),
        feat_channels_kpt=head.get("feat_channels_kpt", 512),
        feat_channels_hm=head.get("feat_channels_hm", 512),
        stacked_convs=head.get("stacked_convs", 4),
        stacked_convs_kpt=head.get("stacked_convs_kpt", 4),
        stacked_convs_hm=head.get("stacked_convs_hm", 3),
        with_hm=head.get("with_hm_loss", True),
        strides=tuple(head.get("strides", (8, 16, 32, 64, 128))),
        center_sampling=head.get("center_sampling", False),
        center_sample_radius=head.get("center_sample_radius", 1.5),
        loss_cls_weight=_loss_weight(head, "loss_cls", 1.0),
        loss_hm_weight=_loss_weight(head, "loss_hm", 1.0),
        score_thr=(test_cfg or {}).get("score_thr", 0.05),
        max_per_img=(test_cfg or {}).get("max_per_img", 100),
        dtype=dtype)


MODELS.register_module(name=["VideoPoseV1", "VideoPoseV2", "PETR"],
                       module=VideoPoseDetector)


def build_model(cfg: dict, train_cfg=None, test_cfg=None, **kwargs):
    """Reference-compatible alias (``opera/models/builder.py:47``)."""
    return build_detector(cfg, train_cfg=train_cfg, test_cfg=test_cfg,
                          **kwargs)
