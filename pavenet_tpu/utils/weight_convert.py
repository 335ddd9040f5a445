"""PyTorch (reference) checkpoint -> flax params conversion.

Maps the reference ``VideoPoseV1``/``PETR`` state_dict layout
(``third_party/mmcv/mmcv/runner/checkpoint.py`` checkpoints; module names
from ``opera/models/dense_heads/videopose_head_mul_frames.py`` and
``opera/models/utils/transformer.py:20987``) onto this framework's
``VideoPoseDetector`` parameter tree.  Enables (a) loading the reference's
pretrained checkpoints and (b) activation-parity testing against the torch
model.

Conventions:
- torch ``Linear.weight (out, in)``  -> flax ``kernel (in, out)`` (transpose)
- torch ``Conv2d.weight (o, i, kh, kw)`` -> flax ``(kh, kw, i, o)``
- torch MHA ``in_proj_weight (3C, C)`` -> flax q/k/v DenseGeneral kernels
  ``(C, H, D)``; ``out_proj`` -> ``out`` kernel ``(H, D, C)``
- per-frame linears (pre_/now/next_...) -> one fused Dense, frame-major
  concat along the output axis.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _t(w):
    return np.asarray(w).T


def _conv(w):
    return np.asarray(w).transpose(2, 3, 1, 0)


class _StateDict:
    def __init__(self, sd: Dict[str, "np.ndarray"]):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.used = set()

    def __call__(self, key):
        self.used.add(key)
        return self.sd[key]

    def has(self, key):
        return key in self.sd

    def unused(self):
        return sorted(set(self.sd) - self.used)


def _linear(sd, prefix):
    return {"kernel": _t(sd(f"{prefix}.weight")),
            "bias": sd(f"{prefix}.bias")}


def _norm(sd, prefix):
    return {"scale": sd(f"{prefix}.weight"), "bias": sd(f"{prefix}.bias")}


def _bn(sd, prefix):
    params = {"scale": sd(f"{prefix}.weight"), "bias": sd(f"{prefix}.bias")}
    stats = {"mean": sd(f"{prefix}.running_mean"),
             "var": sd(f"{prefix}.running_var")}
    return params, stats


def _mha(sd, prefix, num_heads):
    w = sd(f"{prefix}.attn.in_proj_weight")
    b = sd(f"{prefix}.attn.in_proj_bias")
    C = w.shape[1]
    D = C // num_heads
    out_w = sd(f"{prefix}.attn.out_proj.weight")
    out_b = sd(f"{prefix}.attn.out_proj.bias")

    def qkv(i):
        wi = w[i * C:(i + 1) * C]
        bi = b[i * C:(i + 1) * C]
        return {"kernel": _t(wi).reshape(C, num_heads, D),
                "bias": bi.reshape(num_heads, D)}

    return {"MultiHeadDotProductAttention_0": {
        "query": qkv(0), "key": qkv(1), "value": qkv(2),
        "out": {"kernel": _t(out_w).reshape(num_heads, D, C),
                "bias": out_b},
    }}


def _fused_frames(sd, prefixes):
    ks = [_linear(sd, p) for p in prefixes]
    return {"kernel": np.concatenate([k["kernel"] for k in ks], -1),
            "bias": np.concatenate([k["bias"] for k in ks], -1)}


def _mlp(sd, prefix, torch_idxs):
    """Sequential of Linear/ReLU -> MLP Dense_i params."""
    return {f"Dense_{i}": _linear(sd, f"{prefix}.{t}")
            for i, t in enumerate(torch_idxs)}


def _sigma_branch(sd, prefix, num_fcs=2):
    out = {f"Dense_{i}": _linear(sd, f"{prefix}.{i}")
           for i in range(num_fcs)}
    out[f"Dense_{num_fcs}"] = _linear(sd, f"{prefix}.{num_fcs}.linear")
    return out


def _flow(sd, prefix):
    out = {}
    for i in range(6):
        out[f"s{i}"] = {f"Dense_{j}": _linear(sd, f"{prefix}.s.{i}.{2 * j}")
                        for j in range(3)}
        out[f"t{i}"] = {f"Dense_{j}": _linear(sd, f"{prefix}.t.{i}.{2 * j}")
                        for j in range(3)}
    return out


def _resnet(sd, depth) -> Tuple[dict, dict]:
    from ..models.backbones.resnet import ARCH_SETTINGS
    block, stage_blocks = ARCH_SETTINGS[depth]
    params, stats = {}, {}
    params["conv1"] = {"kernel": _conv(sd("backbone.conv1.weight"))}
    params["bn1"], stats["bn1"] = _bn(sd, "backbone.bn1")
    n_convs = 3 if block == "bottleneck" else 2
    for s, blocks in enumerate(stage_blocks):
        for i in range(blocks):
            tp = f"backbone.layer{s + 1}.{i}"
            name = f"layer{s + 1}_{i}"
            p, st = {}, {}
            for c in range(1, n_convs + 1):
                p[f"conv{c}"] = {"kernel": _conv(sd(f"{tp}.conv{c}.weight"))}
                p[f"bn{c}"], st[f"bn{c}"] = _bn(sd, f"{tp}.bn{c}")
            if sd.has(f"{tp}.downsample.0.weight"):
                p["downsample_conv"] = {
                    "kernel": _conv(sd(f"{tp}.downsample.0.weight"))}
                p["downsample_bn"], st["downsample_bn"] = _bn(
                    sd, f"{tp}.downsample.1")
            params[name] = p
            stats[name] = st
    return params, stats


def _neck(sd, num_ins=3, num_outs=4):
    p = {}
    for i in range(num_ins):
        p[f"conv{i}"] = {"kernel": _conv(sd(f"neck.convs.{i}.conv.weight"))}
        p[f"gn{i}"] = _norm(sd, f"neck.convs.{i}.gn")
    for j in range(num_outs - num_ins):
        p[f"extra_conv{j}"] = {
            "kernel": _conv(sd(f"neck.extra_convs.{j}.conv.weight"))}
        p[f"extra_gn{j}"] = _norm(sd, f"neck.extra_convs.{j}.gn")
    return p


def _deform_attn(sd, prefix, multi_frame: bool, num_frames: int = 3):
    p = {"value_proj": _linear(sd, f"{prefix}.value_proj"),
         "output_proj": _linear(sd, f"{prefix}.output_proj")}
    if not multi_frame:
        p["sampling_offsets"] = _linear(sd, f"{prefix}.sampling_offsets")
        p["attention_weights"] = _linear(sd, f"{prefix}.attention_weights")
    else:
        # frame order: pre..., now, next... (T=3: pre, now, next;
        # T=5 adds pre_pre/next_next)
        if num_frames == 3:
            off = ["pre_sampling_offsets", "sampling_offsets",
                   "next_sampling_offsets"]
            wts = ["pre_attention_weights", "attention_weights",
                   "next_attention_weights"]
        elif num_frames == 5:
            off = ["pre_pre_sampling_offsets", "pre_sampling_offsets",
                   "sampling_offsets", "next_sampling_offsets",
                   "next_next_sampling_offsets"]
            wts = ["pre_pre_attention_weights", "pre_attention_weights",
                   "attention_weights", "next_attention_weights",
                   "next_next_attention_weights"]
        else:
            raise ValueError(num_frames)
        p["sampling_offsets"] = _fused_frames(
            sd, [f"{prefix}.{o}" for o in off])
        p["attention_weights"] = _fused_frames(
            sd, [f"{prefix}.{w}" for w in wts])
    return p


def _ffn(sd, prefix):
    return {"Dense_0": _linear(sd, f"{prefix}.layers.0.0"),
            "Dense_1": _linear(sd, f"{prefix}.layers.1")}


def convert_videopose_state_dict(state_dict: dict, num_frames: int = 3,
                                 num_decoder_layers: int = 3,
                                 num_refine_layers: int = 2,
                                 num_encoder_layers: int = 6,
                                 num_heads: int = 8,
                                 backbone_depth: int = 50,
                                 strict: bool = False):
    """Returns {'params': ..., 'batch_stats': ...} for VideoPoseDetector."""
    sd = _StateDict(state_dict)
    T = num_frames
    now = T // 2

    backbone_p, backbone_s = _resnet(sd, backbone_depth)
    neck_p = _neck(sd)

    h = {}
    tfm = "bbox_head.transformer"
    h["level_embeds"] = sd(f"{tfm}.level_embeds")
    h["enc_output"] = _linear(sd, f"{tfm}.enc_output")
    h["enc_output_norm"] = _norm(sd, f"{tfm}.enc_output_norm")
    h["query_embedding"] = sd("bbox_head.query_embedding.weight")
    h["refine_query_embedding"] = sd(
        f"{tfm}.refine_query_embedding.weight")

    for i in range(num_encoder_layers):
        lp = f"{tfm}.encoder.layers.{i}"
        h[f"encoder_layer{i}"] = {
            "attn": _deform_attn(sd, f"{lp}.attentions.0",
                                 multi_frame=False),
            "norm1": _norm(sd, f"{lp}.norms.0"),
            "ffn": _ffn(sd, f"{lp}.ffns.0"),
            "norm2": _norm(sd, f"{lp}.norms.1"),
        }

    for i in range(num_decoder_layers):
        lp = f"{tfm}.decoder.layers.{i}"
        h[f"dec_self_attn{i}"] = _mha(sd, f"{lp}.attentions.0", num_heads)
        h[f"dec_cross_attn{i}"] = _deform_attn(
            sd, f"{lp}.attentions.1", multi_frame=True, num_frames=T)
        h[f"dec_norm1_{i}"] = _norm(sd, f"{lp}.norms.0")
        h[f"dec_norm2_{i}"] = _norm(sd, f"{lp}.norms.1")
        h[f"dec_norm3_{i}"] = _norm(sd, f"{lp}.norms.2")
        h[f"dec_ffn{i}"] = _ffn(sd, f"{lp}.ffns.0")

    num_pred = num_decoder_layers + 1
    mlp_idx = (0, 2, 4, 6)
    for i in range(num_pred):
        h[f"cls_branch{i}"] = _linear(sd, f"bbox_head.cls_branches.{i}")
        h[f"kpt_branch{i}"] = _mlp(sd, f"bbox_head.kpt_branches.{i}",
                                   mlp_idx)
        h[f"sigma_branch{i}"] = _sigma_branch(
            sd, f"bbox_head.dec_fc_sigma_branches.{i}")
    aux_names = (["pre_kpt_branches", "next_kpt_branches"] if T == 3 else
                 ["pre_pre_kpt_branches", "pre_kpt_branches",
                  "next_kpt_branches", "next_next_kpt_branches"])
    for f, aux in enumerate(aux_names):
        for i in range(num_decoder_layers):
            h[f"aux_kpt_branch_f{f}_l{i}"] = _mlp(
                sd, f"bbox_head.{aux}.{i}", mlp_idx)

    for i in range(num_refine_layers):
        lp = f"{tfm}.refine_decoder.layers.{i}"
        h[f"ref_self_attn{i}"] = _mha(sd, f"{lp}.attentions.0", num_heads)
        h[f"ref_cross_attn{i}"] = _deform_attn(
            sd, f"{lp}.attentions.1", multi_frame=True, num_frames=T)
        h[f"ref_norm1_{i}"] = _norm(sd, f"{lp}.norms.0")
        h[f"ref_norm2_{i}"] = _norm(sd, f"{lp}.norms.1")
        h[f"ref_norm3_{i}"] = _norm(sd, f"{lp}.norms.2")
        h[f"ref_ffn{i}"] = _ffn(sd, f"{lp}.ffns.0")
    ref_idx = (0, 2, 4)
    refine_names = {0: "pre_refine_kpt_branches", now: "refine_kpt_branches",
                    T - 1: "next_refine_kpt_branches"}
    if T == 5:
        refine_names[1] = "pre_refine_kpt_branches"
        refine_names[0] = "pre_pre_refine_kpt_branches"
        refine_names[3] = "next_refine_kpt_branches"
        refine_names[4] = "next_next_refine_kpt_branches"
    for t in range(T):
        for i in range(num_refine_layers):
            h[f"refine_kpt_branch_f{t}_l{i}"] = _mlp(
                sd, f"bbox_head.{refine_names[t]}.{i}", ref_idx)
    for i in range(num_refine_layers):
        h[f"refine_sigma_branch{i}"] = _sigma_branch(
            sd, f"bbox_head.refine_fc_sigma_branches.{i}")

    h["fc_hm"] = _linear(sd, "bbox_head.fc_hm")
    for flow in ("enc_flow", "dec_flow", "flow"):
        h[flow] = _flow(sd, f"bbox_head.{flow}")

    params = {"backbone": backbone_p, "neck": neck_p, "head": h}
    variables = {"params": params,
                 "batch_stats": {"backbone": backbone_s}}
    unused = [k for k in sd.unused()
              if not k.endswith("num_batches_tracked")
              and ".mask" not in k and "prior" not in k]
    if strict and unused:
        raise KeyError(f"unconverted reference params: {unused[:20]}")
    variables["_unused_reference_keys"] = unused
    return variables


def load_torch_checkpoint(path: str):
    """Load a torch .pth into a flat numpy state_dict (CPU)."""
    import torch
    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() for k, v in sd.items()}
