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


def _conv_bn(sd, conv_key, bn_key):
    params = {"conv": {"kernel": _conv(sd(f"{conv_key}.weight"))}}
    bn_p, bn_s = _bn(sd, bn_key)
    params["bn"] = bn_p
    return params, {"bn": bn_s}


def _hrnet(sd, width=48) -> Tuple[dict, dict]:
    """mmdet HRNet state_dict -> flax HRNet params/batch_stats
    (``mmdet/models/backbones/hrnet.py``: stem conv1/bn1+conv2/bn2,
    Bottleneck layer1, transition{n} Sequentials, per-module branches +
    fuse_layers)."""
    from ..models.backbones.hrnet import HRNET_EXTRA
    extra = HRNET_EXTRA[width]
    p, st = {}, {}
    p["stem1"], st["stem1"] = _conv_bn(sd, "backbone.conv1", "backbone.bn1")
    p["stem2"], st["stem2"] = _conv_bn(sd, "backbone.conv2", "backbone.bn2")

    _, _, (n1,), _ = extra[0]
    for k in range(n1):
        tp = f"backbone.layer1.{k}"
        bp, bs = {}, {}
        for c in (1, 2, 3):
            bp[f"conv{c}"] = {"kernel": _conv(sd(f"{tp}.conv{c}.weight"))}
            bp[f"bn{c}"], bs[f"bn{c}"] = _bn(sd, f"{tp}.bn{c}")
        if sd.has(f"{tp}.downsample.0.weight"):
            bp["downsample_conv"] = {
                "kernel": _conv(sd(f"{tp}.downsample.0.weight"))}
            bp["downsample_bn"], bs["downsample_bn"] = _bn(
                sd, f"{tp}.downsample.1")
        p[f"layer1_{k}"] = bp
        st[f"layer1_{k}"] = bs

    prev = 1
    for s, (_, num_modules, num_blocks, channels) in enumerate(
            extra[1:], start=2):
        tname = f"backbone.transition{s - 1}"
        for b in range(len(channels)):
            if b < prev:
                key = f"{tname}.{b}.0.weight"   # channel-adapting conv
                bn = f"{tname}.{b}.1"
            else:
                key = f"{tname}.{b}.0.0.weight"  # new-branch downsample
                bn = f"{tname}.{b}.0.1"
            if sd.has(key):
                cp, cs = {"conv": {"kernel": _conv(sd(key))}}, {}
                bn_p, bn_s = _bn(sd, bn)
                cp["bn"], cs["bn"] = bn_p, bn_s
                p[f"transition{s - 1}_{b}"] = cp
                st[f"transition{s - 1}_{b}"] = cs
        prev = len(channels)

        for m in range(num_modules):
            mp, ms = {}, {}
            base = f"backbone.stage{s}.{m}"
            for b in range(len(channels)):
                for k in range(num_blocks[b]):
                    tp = f"{base}.branches.{b}.{k}"
                    bp, bs = {}, {}
                    for c in (1, 2):
                        bp[f"conv{c}"] = {
                            "kernel": _conv(sd(f"{tp}.conv{c}.weight"))}
                        bp[f"bn{c}"], bs[f"bn{c}"] = _bn(sd, f"{tp}.bn{c}")
                    mp[f"branch{b}_block{k}"] = bp
                    ms[f"branch{b}_block{k}"] = bs
            for i in range(len(channels)):
                for j in range(len(channels)):
                    fp = f"{base}.fuse_layers.{i}.{j}"
                    if j > i:
                        mp[f"fuse{i}_{j}_conv"] = {
                            "kernel": _conv(sd(f"{fp}.0.weight"))}
                        bn_p, bn_s = _bn(sd, f"{fp}.1")
                        mp[f"fuse{i}_{j}_bn"] = bn_p
                        ms[f"fuse{i}_{j}_bn"] = bn_s
                    elif j < i:
                        for t in range(i - j):
                            cp, cs = _conv_bn(sd, f"{fp}.{t}.0", f"{fp}.{t}.1")
                            mp[f"fuse{i}_{j}_down{t}"] = cp
                            ms[f"fuse{i}_{j}_down{t}"] = cs
            p[f"stage{s}_module{m}"] = mp
            st[f"stage{s}_module{m}"] = ms
    return p, st


def _swin(sd, depths=(2, 2, 18, 2), out_indices=(1, 2, 3)):
    """mmdet SwinTransformer state_dict -> flax SwinTransformer params.

    Key layout from ``mmdet/models/backbones/swin.py`` (attn under
    ``attn.w_msa``, FFN under ``ffn.layers.0.0``/``ffn.layers.1``, output
    norms ``norm{i}``).  mmcv's ``PatchMerging`` samples the 2x2
    neighborhood with ``nn.Unfold`` — channel-major (c*4 + position) with
    positions row-major — while the flax module concatenates
    position-major ([even/even, odd/even, even/odd, odd/odd] blocks of C);
    the reduction/norm weights are permuted accordingly.
    """
    p = {}
    p["patch_embed"] = {
        "kernel": _conv(sd("backbone.patch_embed.projection.weight")),
        "bias": sd("backbone.patch_embed.projection.bias")}
    p["patch_norm"] = _norm(sd, "backbone.patch_embed.norm")
    for s, depth in enumerate(depths):
        for b in range(depth):
            tp = f"backbone.stages.{s}.blocks.{b}"
            p[f"stage{s}_block{b}"] = {
                "norm1": _norm(sd, f"{tp}.norm1"),
                "attn": {
                    "qkv": _linear(sd, f"{tp}.attn.w_msa.qkv"),
                    "proj": _linear(sd, f"{tp}.attn.w_msa.proj"),
                    "relative_position_bias_table": sd(
                        f"{tp}.attn.w_msa.relative_position_bias_table"),
                },
                "norm2": _norm(sd, f"{tp}.norm2"),
                "fc1": _linear(sd, f"{tp}.ffn.layers.0.0"),
                "fc2": _linear(sd, f"{tp}.ffn.layers.1"),
            }
        if s < len(depths) - 1:
            tp = f"backbone.stages.{s}.downsample"
            red_w = sd(f"{tp}.reduction.weight")          # (2C, 4C)
            cin = red_w.shape[1] // 4
            # my position p in [ee, oe, eo, oo] -> unfold position q in
            # row-major [(0,0),(0,1),(1,0),(1,1)]
            q_of_p = (0, 2, 1, 3)
            perm = np.array([c * 4 + q_of_p[pp]
                             for pp in range(4) for c in range(cin)])
            nw = sd(f"{tp}.norm.weight")[perm]
            nb = sd(f"{tp}.norm.bias")[perm]
            p[f"merge{s}"] = {
                "reduction": {"kernel": _t(red_w[:, perm])},
                "norm": {"scale": nw, "bias": nb}}
    for i in out_indices:
        p[f"out_norm{i}"] = _norm(sd, f"backbone.norm{i}")
    return p


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


def _deep_merge(base: dict, upd: dict) -> dict:
    out = dict(base)
    for k, v in upd.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def convert_petr_state_dict(state_dict: dict, init_params: dict,
                            num_decoder_layers: int = 3,
                            num_refine_layers: int = 2,
                            num_encoder_layers: int = 6,
                            num_heads: int = 8,
                            backbone_depth: int = 50,
                            backbone_type: str = "resnet",
                            swin_depths=(2, 2, 18, 2),
                            hrnet_width: int = 48,
                            strict: bool = False):
    """Reference single-frame PETR checkpoint -> VideoPoseDetector(T=1).

    Layout from ``opera/models/dense_heads/petr_head.py:151-194`` and
    ``PETRTransformer`` (``opera/models/utils/transformer.py:4235``): same
    tree as the video model minus sigma branches / flows / aux-frame
    branches, plus an active ``hm_encoder``.  ``init_params`` (a freshly
    initialized param tree) supplies the subtrees PETR does not have
    (sigma branches + flows, unused under the L1 recipe).
    """
    sd = _StateDict(state_dict)
    if backbone_type == "swin":
        backbone_p, backbone_s = _swin(sd, depths=swin_depths), {}
    elif backbone_type == "hrnet":
        backbone_p, backbone_s = _hrnet(sd, width=hrnet_width)
    else:
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

    def enc_layer(lp):
        return {
            "attn": _deform_attn(sd, f"{lp}.attentions.0",
                                 multi_frame=False),
            "norm1": _norm(sd, f"{lp}.norms.0"),
            "ffn": _ffn(sd, f"{lp}.ffns.0"),
            "norm2": _norm(sd, f"{lp}.norms.1"),
        }

    for i in range(num_encoder_layers):
        h[f"encoder_layer{i}"] = enc_layer(f"{tfm}.encoder.layers.{i}")
    h["hm_encoder_layer"] = enc_layer(f"{tfm}.hm_encoder.layers.0")

    for i in range(num_decoder_layers):
        lp = f"{tfm}.decoder.layers.{i}"
        h[f"dec_self_attn{i}"] = _mha(sd, f"{lp}.attentions.0", num_heads)
        # single-frame MultiScaleDeformablePoseAttention
        # (``transformer.py:252``): plain offset/weight heads
        h[f"dec_cross_attn{i}"] = _deform_attn(
            sd, f"{lp}.attentions.1", multi_frame=False)
        h[f"dec_norm1_{i}"] = _norm(sd, f"{lp}.norms.0")
        h[f"dec_norm2_{i}"] = _norm(sd, f"{lp}.norms.1")
        h[f"dec_norm3_{i}"] = _norm(sd, f"{lp}.norms.2")
        h[f"dec_ffn{i}"] = _ffn(sd, f"{lp}.ffns.0")

    mlp_idx = (0, 2, 4, 6)
    for i in range(num_decoder_layers + 1):
        h[f"cls_branch{i}"] = _linear(sd, f"bbox_head.cls_branches.{i}")
        h[f"kpt_branch{i}"] = _mlp(sd, f"bbox_head.kpt_branches.{i}",
                                   mlp_idx)

    for i in range(num_refine_layers):
        lp = f"{tfm}.refine_decoder.layers.{i}"
        h[f"ref_self_attn{i}"] = _mha(sd, f"{lp}.attentions.0", num_heads)
        h[f"ref_cross_attn{i}"] = _deform_attn(
            sd, f"{lp}.attentions.1", multi_frame=False)
        h[f"ref_norm1_{i}"] = _norm(sd, f"{lp}.norms.0")
        h[f"ref_norm2_{i}"] = _norm(sd, f"{lp}.norms.1")
        h[f"ref_norm3_{i}"] = _norm(sd, f"{lp}.norms.2")
        h[f"ref_ffn{i}"] = _ffn(sd, f"{lp}.ffns.0")
        h[f"refine_kpt_branch_f0_l{i}"] = _mlp(
            sd, f"bbox_head.refine_kpt_branches.{i}", (0, 2, 4))

    h["fc_hm"] = _linear(sd, "bbox_head.fc_hm")

    params = _deep_merge(
        init_params,
        {"backbone": backbone_p, "neck": neck_p, "head": h})
    variables = {"params": params,
                 "batch_stats": {"backbone": backbone_s}}
    unused = [k for k in sd.unused()
              if not k.endswith("num_batches_tracked")]
    if strict and unused:
        raise KeyError(f"unconverted reference params: {unused[:20]}")
    variables["_unused_reference_keys"] = unused
    return variables


def convert_soit_state_dict(state_dict: dict,
                            num_decoder_layers: int = 6,
                            num_encoder_layers: int = 6,
                            num_heads: int = 8,
                            backbone_depth: int = 50,
                            strict: bool = False):
    """Reference SOIT checkpoint -> SOITDetector params.

    Layout from ``opera/models/dense_heads/soit_head.py:70-117`` (cls/reg/
    seg branches, parameter-free dynamic encoder) + ``SOITTransformer``
    (``opera/models/utils/transformer.py:24``: encoder, 1-layer
    seg_encoder, mask_trans(+norm)) on mmdet's two-stage
    DeformableDetrTransformer (pos_trans/pos_trans_norm, enc_output).
    """
    sd = _StateDict(state_dict)
    backbone_p, backbone_s = _resnet(sd, backbone_depth)
    neck_p = _neck(sd)

    h = {}
    tfm = "bbox_head.transformer"
    h["level_embeds"] = sd(f"{tfm}.level_embeds")
    h["enc_output"] = _linear(sd, f"{tfm}.enc_output")
    h["enc_output_norm"] = _norm(sd, f"{tfm}.enc_output_norm")
    h["pos_trans"] = _linear(sd, f"{tfm}.pos_trans")
    h["pos_trans_norm"] = _norm(sd, f"{tfm}.pos_trans_norm")
    h["mask_trans"] = _linear(sd, f"{tfm}.mask_trans")
    h["mask_trans_norm"] = _norm(sd, f"{tfm}.mask_trans_norm")

    def enc_layer(lp):
        return {
            "attn": _deform_attn(sd, f"{lp}.attentions.0",
                                 multi_frame=False),
            "norm1": _norm(sd, f"{lp}.norms.0"),
            "ffn": _ffn(sd, f"{lp}.ffns.0"),
            "norm2": _norm(sd, f"{lp}.norms.1"),
        }

    for i in range(num_encoder_layers):
        h[f"encoder_layer{i}"] = enc_layer(f"{tfm}.encoder.layers.{i}")
    h["seg_encoder_layer"] = enc_layer(f"{tfm}.seg_encoder.layers.0")

    for i in range(num_decoder_layers):
        lp = f"{tfm}.decoder.layers.{i}"
        h[f"dec_self_attn{i}"] = _mha(sd, f"{lp}.attentions.0", num_heads)
        h[f"dec_cross_attn{i}"] = _deform_attn(
            sd, f"{lp}.attentions.1", multi_frame=False)
        h[f"dec_norm1_{i}"] = _norm(sd, f"{lp}.norms.0")
        h[f"dec_norm2_{i}"] = _norm(sd, f"{lp}.norms.1")
        h[f"dec_norm3_{i}"] = _norm(sd, f"{lp}.norms.2")
        h[f"dec_ffn{i}"] = _ffn(sd, f"{lp}.ffns.0")

    idx = (0, 2, 4)
    for i in range(num_decoder_layers + 1):
        h[f"cls_branch{i}"] = _linear(sd, f"bbox_head.cls_branches.{i}")
        h[f"reg_branch{i}"] = _mlp(sd, f"bbox_head.reg_branches.{i}", idx)
        if i < num_decoder_layers:
            h[f"seg_branch{i}"] = _mlp(sd, f"bbox_head.seg_branches.{i}",
                                       idx)

    params = dict(h)
    params["backbone"] = backbone_p
    params["neck"] = neck_p
    variables = {"params": params,
                 "batch_stats": {"backbone": backbone_s}}
    unused = [k for k in sd.unused()
              if not k.endswith("num_batches_tracked")]
    if strict and unused:
        raise KeyError(f"unconverted reference params: {unused[:20]}")
    variables["_unused_reference_keys"] = unused
    return variables


def _convgn(sd, prefix):
    """mmcv ConvModule(conv no-bias + GN) -> ConvGN {Conv_0, GroupNorm_0}."""
    return {"Conv_0": {"kernel": _conv(sd(f"{prefix}.conv.weight"))},
            "GroupNorm_0": _norm(sd, f"{prefix}.gn")}


def _conv_bias(sd, prefix):
    return {"kernel": _conv(sd(f"{prefix}.weight")),
            "bias": sd(f"{prefix}.bias")}


def _dcn_gn(sd, conv_prefix, gn_prefix):
    """DeformConv2d weight (o,i,3,3) -> DeformConvGN Dense kernel
    (tap*C+i, o) + GroupNorm (see ``detectors/inspose.DeformConvGN``:
    patches are tap-major, channel-minor)."""
    w = np.asarray(sd(f"{conv_prefix}.weight"))
    o, i = w.shape[:2]
    kernel = w.transpose(2, 3, 1, 0).reshape(9 * i, o)
    return {"kernel": {"kernel": kernel},
            "GroupNorm_0": _norm(sd, gn_prefix)}


def convert_inspose_state_dict(state_dict: dict,
                               stacked_convs: int = 4,
                               stacked_convs_kpt: int = 4,
                               stacked_convs_hm: int = 3,
                               with_hm: bool = True,
                               num_fpn_outs: int = 5,
                               backbone_depth: int = 50,
                               strict: bool = False):
    """Reference InsPose checkpoint -> ``InsPoseDetector`` params.

    Layout from ``opera/models/dense_heads/inspose_head.py:153-258``
    (cls/ctrl/kpt/shared/hm ConvModule towers, star DeformConv2d+GN pairs,
    conv_cls/controller/kpt_offset heads) over mmdet ``FPN``
    (``lateral_convs``/``fpn_convs``, extra convs stored at the tail of
    ``fpn_convs``)."""
    sd = _StateDict(state_dict)
    backbone_p, backbone_s = _resnet(sd, backbone_depth)

    neck = {}
    n_lat = 3  # start_level=1 on a 4-level ResNet
    for i in range(n_lat):
        neck[f"lateral{i}"] = _conv_bias(sd, f"neck.lateral_convs.{i}.conv")
        neck[f"fpn{i}"] = _conv_bias(sd, f"neck.fpn_convs.{i}.conv")
    for j in range(num_fpn_outs - n_lat):
        neck[f"fpn_extra{j}"] = _conv_bias(
            sd, f"neck.fpn_convs.{n_lat + j}.conv")

    h = {"neck": neck}
    bh = "bbox_head"
    for i in range(stacked_convs):
        h[f"cls_tower{i}"] = _convgn(sd, f"{bh}.cls_convs.{i}")
        h[f"ctrl_tower{i}"] = _convgn(sd, f"{bh}.ctrl_convs.{i}")
    for i in range(stacked_convs_kpt):
        h[f"kpt_tower{i}"] = _convgn(sd, f"{bh}.kpt_convs.{i}")
    for i in range(4):
        h[f"shared_tower{i}"] = _convgn(sd, f"{bh}.shared_convs.{i}")
    h["shared_out"] = _convgn(sd, f"{bh}.shared_convs.4")
    h["conv_cls"] = _conv_bias(sd, f"{bh}.conv_cls")
    h["controller"] = _conv_bias(sd, f"{bh}.controller")
    h["kpt_offset"] = _conv_bias(sd, f"{bh}.kpt_offset")
    h["cls_star"] = _dcn_gn(sd, f"{bh}.cls_star_conv", f"{bh}.cls_star_gn")
    h["ctr_star"] = _dcn_gn(sd, f"{bh}.ctr_star_conv", f"{bh}.ctr_star_gn")
    if with_hm:
        for i in range(stacked_convs_hm):
            h[f"hm_tower{i}"] = _convgn(sd, f"{bh}.hm_convs.{i}")
        h["hm_pred"] = _conv_bias(sd, f"{bh}.hm_pred")
        h["ae_pred"] = _conv_bias(sd, f"{bh}.ae_pred")
        h["hm_offset"] = _conv_bias(sd, f"{bh}.hm_offset")

    params = dict(h)
    params["backbone"] = backbone_p
    variables = {"params": params,
                 "batch_stats": {"backbone": backbone_s}}
    unused = [k for k in sd.unused()
              if not k.endswith("num_batches_tracked")]
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
