"""Config -> model construction.

Keeps the reference's config surface (``opera/models/builder.py``: a
``model = dict(type='opera.VideoPoseV1', backbone=..., bbox_head=...)``
dict) while mapping onto the collapsed flax architecture.  The mm-style
nested component configs are translated to ``VideoPoseDetector`` hyper-
parameters; unknown experimental knobs raise rather than silently drift.
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


def build_detector(cfg: dict, train_cfg: Optional[dict] = None,
                   test_cfg: Optional[dict] = None,
                   dtype=jnp.float32) -> VideoPoseDetector:
    """Build a detector from a reference-style model config dict."""
    cfg = dict(cfg)
    det_type = _type_name(cfg)
    if det_type == "SOIT":
        return _build_soit(cfg, train_cfg, test_cfg, dtype)
    if det_type not in ("VideoPoseV1", "VideoPoseV2", "PETR"):
        raise KeyError(f"unsupported detector type {det_type!r}")

    backbone = cfg.get("backbone", {})
    if _type_name(backbone, "ResNet") != "ResNet":
        raise KeyError(
            f"unsupported backbone {_type_name(backbone)!r} (Swin lands in "
            "a later milestone)")
    head = cfg.get("bbox_head", {})
    transformer = head.get("transformer", {})
    encoder = transformer.get("encoder", {})
    decoder = transformer.get("decoder", {})
    refine = transformer.get("refine_decoder", {})
    train_cfg = train_cfg if train_cfg is not None else cfg.get("train_cfg")
    test_cfg = test_cfg if test_cfg is not None else cfg.get("test_cfg")

    def cost_weight(name, default):
        if not train_cfg:
            return default
        return train_cfg.get("assigner", {}).get(name, {}).get(
            "weight", default)

    num_frames = head.get("num_frames", 1 if det_type == "PETR" else 3)
    kwargs = dict(
        num_frames=num_frames,
        num_keypoints=head.get("num_keypoints", 17),
        num_classes=head.get("num_classes", 1),
        num_query=head.get("num_query", 300),
        backbone_depth=backbone.get("depth", 50),
        backbone_out_indices=tuple(backbone.get("out_indices", (1, 2, 3))),
        embed_dims=encoder.get("transformerlayers", {}).get(
            "attn_cfgs", {}).get("embed_dims", 256),
        num_encoder_layers=encoder.get("num_layers", 6),
        num_decoder_layers=decoder.get("num_layers", 3),
        num_refine_layers=refine.get("num_layers", 2),
        loss_cls_weight=head.get("loss_cls", {}).get("loss_weight", 0.5),
        loss_kpt_weight=head.get("loss_kpt", {}).get("loss_weight", 1.0),
        loss_kpt_rpn_weight=head.get("loss_kpt_rpn", {}).get(
            "loss_weight", 1.0),
        loss_kpt_refine_weight=head.get("loss_kpt_refine", {}).get(
            "loss_weight", 1.0),
        cls_cost_weight=cost_weight("cls_cost", 2.0),
        kpt_cost_weight=cost_weight("kpt_cost", 70.0),
        oks_cost_weight=cost_weight("oks_cost", 7.0),
        max_per_img=(test_cfg or {}).get("max_per_img", 100),
        dtype=dtype,
    )
    return VideoPoseDetector(**kwargs)


def _build_soit(cfg, train_cfg, test_cfg, dtype):
    from .detectors.soit import SOITDetector
    head = cfg.get("bbox_head", {})
    backbone = cfg.get("backbone", {})
    transformer = head.get("transformer", {})
    test_cfg = test_cfg if test_cfg is not None else cfg.get("test_cfg", {})
    return SOITDetector(
        num_classes=head.get("num_classes", 80),
        num_query=head.get("num_query", 300),
        backbone_depth=backbone.get("depth", 50),
        num_encoder_layers=transformer.get("encoder", {}).get(
            "num_layers", 6),
        num_decoder_layers=transformer.get("decoder", {}).get(
            "num_layers", 6),
        max_per_img=(test_cfg or {}).get("max_per_img", 100),
        dtype=dtype)


MODELS.register_module(name=["VideoPoseV1", "VideoPoseV2", "PETR"],
                       module=VideoPoseDetector)


def build_model(cfg: dict, train_cfg=None, test_cfg=None, **kwargs):
    """Reference-compatible alias (``opera/models/builder.py:47``)."""
    return build_detector(cfg, train_cfg=train_cfg, test_cfg=test_cfg,
                          **kwargs)
