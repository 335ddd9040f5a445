"""PAVE-Net video pose head: encoder + two-stage proposals + spatiotemporal
pose decoder + per-keypoint joint (refine) decoder + RealNVP flows.

This single flax module rebuilds the reference's split across
``opera/models/dense_heads/videopose_head_mul_frames.py`` (head branches,
flows) and ``opera/models/utils/transformer.py:20987``
(``VideoPoseTransformerMulFrames``), ``:6662``
(``VideoPoseTransformerDecoderV2``) and mmdet's
``DeformableDetrTransformerDecoderV1`` (``mmdet/models/utils/
transformer.py:795``).  Collapsing the mm-layering puts all per-layer
branches next to the decoders that drive them, which is the natural shape
for a jitted functional forward.

TPU-first design choices (vs. the reference):
- batch-first everywhere; the frame axis is an explicit tensor axis
  ``(B, T, ...)`` instead of interleaved batch entries, and T is a config
  value, not a class name (one module replaces the NumFrames3/5 pairs);
- per-frame branch MLPs are evaluated as a stacked ``(T, ...)`` parameter
  group in one pass;
- all shapes static: GT padded to ``max_gt``, images padded to a bucket.
- with ``num_frames=1`` this head *is* the single-frame PETR head modulo
  its heatmap branch (see ``petr_head.py``).
"""
from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..attention.deformable import (
    MultiScaleDeformableAttention,
    MultiFrameDeformableAttention,
    MultiFramePoseDeformableAttention,
)
from ..flows.realnvp import RealNVP
from ..layers.positional_encoding import sine_positional_encoding
from ..layers.transformer import FFN, MLP, MultiheadAttention

Shapes = Tuple[Tuple[int, int], ...]


def inverse_sigmoid(x, eps: float = 1e-5):
    """mmdet ``inverse_sigmoid``: clamped logit."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)


def bias_init_with_prob(prior_prob: float) -> float:
    return float(-math.log((1 - prior_prob) / prior_prob))


def xavier_small(gain: float = 0.01):
    """xavier_uniform scaled by gain (reference Linear_with_norm init)."""
    base = nn.initializers.xavier_uniform()

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * gain
    return init


class SigmaBranch(nn.Module):
    """Sigma regressor: stacked affine layers + small-gain output
    (reference ``videopose_head_mul_frames.py:187-192,1605-1620``:
    Linear x num_kpt_fcs with no activation, then Linear_with_norm
    (norm=False) with xavier gain 0.01)."""
    embed_dims: int
    out_dim: int
    num_fcs: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_fcs):
            x = nn.Dense(self.embed_dims, dtype=self.dtype)(x)
        return nn.Dense(self.out_dim, dtype=self.dtype,
                        kernel_init=xavier_small(0.01))(x)


class EncoderLayer(nn.Module):
    """Deformable self-attn encoder layer, post-norm
    ('self_attn','norm','ffn','norm')."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    feedforward_channels: int = 1024
    dropout: float = 0.1
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, reference_points, spatial_shapes,
                 key_padding_mask, deterministic=True):
        x = MultiScaleDeformableAttention(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            num_levels=self.num_levels, num_points=self.num_points,
            dropout=self.dropout, impl=self.impl, dtype=self.dtype,
            name="attn")(
                x, value=x, reference_points=reference_points,
                spatial_shapes=spatial_shapes,
                key_padding_mask=key_padding_mask, query_pos=pos,
                deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = FFN(self.embed_dims, self.feedforward_channels,
                dropout=self.dropout, dtype=self.dtype, name="ffn")(
                    x, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x)


class VideoPoseHead(nn.Module):
    """See module docstring.  ``num_frames=1`` gives the PETR head core."""
    num_classes: int = 1
    num_frames: int = 3
    num_keypoints: int = 15
    num_query: int = 300
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_encoder_layers: int = 6
    num_decoder_layers: int = 3
    num_refine_layers: int = 2
    encoder_num_points: int = 4
    refine_num_points: int = 4
    feedforward_channels: int = 1024
    num_kpt_fcs: int = 2
    dropout: float = 0.1
    with_heatmap: bool = False  # PETR trains a level-0 heatmap aux branch
    # query construction: the video transformer adds the detached topk
    # encoder token to the learnable content embed
    # (``transformer.py:21399-21403``); PETR uses the learnable embed alone
    # (``transformer.py:4604-4607``)
    query_from_encoder_token: bool = True
    # PETR's decoder detaches reference points between layers
    # (``PetrTransformerDecoder``, ``transformer.py:4222``); the video
    # decoder V2 does not (``transformer.py:6729-6746``)
    detach_decoder_refs: bool = False
    # 'deformable' (parity, default) or 'windowed' — the opt-in TPU-mode
    # encoder (dense local window attention, models/layers/windowed.py);
    # no reference counterpart, needs retraining for accuracy
    encoder_mode: str = "deformable"
    impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        C, K, T = self.embed_dims, self.num_keypoints, self.num_frames
        num_pred = self.num_decoder_layers + 1  # + encoder proposal head

        if self.encoder_mode == "windowed":
            from ..layers.windowed import WindowedEncoderLayer
            self.encoder_layers = [
                WindowedEncoderLayer(
                    embed_dims=C, num_heads=self.num_heads,
                    feedforward_channels=self.feedforward_channels,
                    dropout=self.dropout, shift=bool(i % 2),
                    dtype=self.dtype, name=f"encoder_layer{i}")
                for i in range(self.num_encoder_layers)]
        else:
            self.encoder_layers = [
                EncoderLayer(embed_dims=C, num_heads=self.num_heads,
                             num_levels=self.num_levels,
                             num_points=self.encoder_num_points,
                             feedforward_channels=self.feedforward_channels,
                             dropout=self.dropout, impl=self.impl,
                             dtype=self.dtype, name=f"encoder_layer{i}")
                for i in range(self.num_encoder_layers)]

        self.level_embeds = self.param(
            "level_embeds", nn.initializers.normal(1.0),
            (self.num_levels, C))

        # two-stage proposal transform
        self.enc_output = nn.Dense(C, dtype=self.dtype, name="enc_output")
        self.enc_output_norm = nn.LayerNorm(dtype=self.dtype,
                                            name="enc_output_norm")
        self.query_embedding = self.param(
            "query_embedding", nn.initializers.normal(1.0),
            (self.num_query, 2 * C))
        self.refine_query_embedding = self.param(
            "refine_query_embedding", nn.initializers.normal(1.0), (K, 2 * C))

        # pose decoder
        self.dec_self_attns = [
            MultiheadAttention(C, self.num_heads, self.dropout,
                               dtype=self.dtype, name=f"dec_self_attn{i}")
            for i in range(self.num_decoder_layers)]
        self.dec_cross_attns = [
            MultiFramePoseDeformableAttention(
                num_frames=T, embed_dims=C, num_heads=self.num_heads,
                num_levels=self.num_levels, num_points=K,
                dropout=self.dropout, impl=self.impl, dtype=self.dtype,
                name=f"dec_cross_attn{i}")
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
        self.dec_ffns = [FFN(C, self.feedforward_channels,
                             dropout=self.dropout, dtype=self.dtype,
                             name=f"dec_ffn{i}")
                         for i in range(self.num_decoder_layers)]

        # classification / kpt / sigma branches (cloned per decoder layer
        # + 1 for encoder proposals; reference ``_init_layers``).
        cls_bias = nn.initializers.constant(bias_init_with_prob(0.01))
        self.cls_branches = [
            nn.Dense(self.num_classes, dtype=self.dtype, bias_init=cls_bias,
                     name=f"cls_branch{i}") for i in range(num_pred)]
        kpt_hidden = (512,) * (self.num_kpt_fcs + 1)
        self.kpt_branches = [
            MLP(kpt_hidden, 2 * K, dtype=self.dtype, zero_init_last=True,
                name=f"kpt_branch{i}") for i in range(num_pred)]
        # aux-frame offset branches, one stack per decoder layer; frame
        # order matches the reference concat order (pre..., now, next...).
        self.aux_kpt_branches = [
            [MLP(kpt_hidden, 2 * K, dtype=self.dtype,
                 name=f"aux_kpt_branch_f{f}_l{i}")
             for i in range(self.num_decoder_layers)]
            for f in range(T - 1)]
        self.sigma_branches = [
            SigmaBranch(C, 2 * K, self.num_kpt_fcs, dtype=self.dtype,
                        name=f"sigma_branch{i}") for i in range(num_pred)]

        # joint (refine) decoder
        self.ref_self_attns = [
            MultiheadAttention(C, self.num_heads, self.dropout,
                               dtype=self.dtype, name=f"ref_self_attn{i}")
            for i in range(self.num_refine_layers)]
        self.ref_cross_attns = [
            MultiFrameDeformableAttention(
                num_frames=T, embed_dims=C, num_heads=self.num_heads,
                num_levels=self.num_levels,
                num_points=self.refine_num_points, dropout=self.dropout,
                impl=self.impl, dtype=self.dtype,
                name=f"ref_cross_attn{i}")
            for i in range(self.num_refine_layers)]
        self.ref_norms1 = [nn.LayerNorm(dtype=self.dtype,
                                        name=f"ref_norm1_{i}")
                           for i in range(self.num_refine_layers)]
        self.ref_norms2 = [nn.LayerNorm(dtype=self.dtype,
                                        name=f"ref_norm2_{i}")
                           for i in range(self.num_refine_layers)]
        self.ref_norms3 = [nn.LayerNorm(dtype=self.dtype,
                                        name=f"ref_norm3_{i}")
                           for i in range(self.num_refine_layers)]
        self.ref_ffns = [FFN(C, self.feedforward_channels,
                             dropout=self.dropout, dtype=self.dtype,
                             name=f"ref_ffn{i}")
                         for i in range(self.num_refine_layers)]
        ref_hidden = (C,) * self.num_kpt_fcs
        # refine offset branches: all zero-init last so reference points
        # start unchanged (the reference zero-inits only the 'pre' stack —
        # an apparent leftover; uniform zero-init is an intentional
        # divergence for stable starts).
        self.refine_kpt_branches = [
            [MLP(ref_hidden, 2, dtype=self.dtype, zero_init_last=True,
                 name=f"refine_kpt_branch_f{f}_l{i}")
             for i in range(self.num_refine_layers)]
            for f in range(T)]
        self.refine_sigma_branches = [
            SigmaBranch(C, 2, self.num_kpt_fcs, dtype=self.dtype,
                        name=f"refine_sigma_branch{i}")
            for i in range(self.num_refine_layers)]

        self.fc_hm = nn.Dense(
            K, dtype=self.dtype,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.1)),
            name="fc_hm")
        if self.with_heatmap:
            # PETR's 1-layer single-level heatmap encoder
            # (``transformer.py:4293`` hm_encoder; disabled in the video
            # production model)
            self.hm_encoder_layer = EncoderLayer(
                embed_dims=C, num_heads=self.num_heads, num_levels=1,
                num_points=self.encoder_num_points,
                feedforward_channels=self.feedforward_channels,
                dropout=self.dropout, impl=self.impl, dtype=self.dtype,
                name="hm_encoder_layer")

        self.enc_flow = RealNVP(dtype=self.dtype, name="enc_flow")
        self.dec_flow = RealNVP(dtype=self.dtype, name="dec_flow")
        self.flow = RealNVP(dtype=self.dtype, name="flow")

    # ------------------------------------------------------------------
    # geometry helpers
    # ------------------------------------------------------------------
    @staticmethod
    def encoder_reference_points(spatial_shapes: Shapes, valid_ratios):
        """(B, N, L, 2) normalized per-token reference grid
        (reference ``transformer.py:21159-21188``)."""
        B = valid_ratios.shape[0]
        refs = []
        for lvl, (H, W) in enumerate(spatial_shapes):
            ry = (jnp.arange(H, dtype=jnp.float32) + 0.5)
            rx = (jnp.arange(W, dtype=jnp.float32) + 0.5)
            ry = ry[None, :, None] / (
                valid_ratios[:, lvl, 1][:, None, None] * H)   # (B, H, 1)
            rx = rx[None, None, :] / (
                valid_ratios[:, lvl, 0][:, None, None] * W)   # (B, 1, W)
            ry = jnp.broadcast_to(ry, (B, H, W))
            rx = jnp.broadcast_to(rx, (B, H, W))
            refs.append(jnp.stack([rx, ry], -1).reshape(B, H * W, 2))
        ref = jnp.concatenate(refs, 1)
        return ref[:, :, None, :] * valid_ratios[:, None, :, :]

    @staticmethod
    def gen_proposals(spatial_shapes: Shapes, valid_hw, mask_flatten):
        """Normalized center proposals with invalid entries -> +big
        (reference ``gen_encoder_output_proposals`` ``transformer.py:21095``:
        logit-transformed grid centers scaled by the valid region)."""
        B = valid_hw.shape[0]
        props = []
        for lvl, (H, W) in enumerate(spatial_shapes):
            gy = jnp.arange(H, dtype=jnp.float32)
            gx = jnp.arange(W, dtype=jnp.float32)
            scale_w = valid_hw[:, lvl, 0][:, None, None]
            scale_h = valid_hw[:, lvl, 1][:, None, None]
            px = jnp.broadcast_to((gx[None, None, :] + 0.5), (B, H, W)
                                  ) / scale_w
            py = jnp.broadcast_to((gy[None, :, None] + 0.5), (B, H, W)
                                  ) / scale_h
            props.append(jnp.stack([px, py], -1).reshape(B, H * W, 2))
        proposals = jnp.concatenate(props, 1)  # (B, N, 2)
        valid = jnp.all((proposals > 0.01) & (proposals < 0.99), -1)
        valid = valid & (~mask_flatten)
        logit = jnp.log(proposals / jnp.clip(1 - proposals, 1e-9, None))
        big = jnp.asarray(1e6, logit.dtype)  # finite stand-in for inf
        logit = jnp.where(valid[..., None], logit, big)
        return logit, valid

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------
    def __call__(self, mlvl_feats, mlvl_masks, valid_ratios,
                 deterministic: bool = True, return_heatmap: bool = False):
        """Main forward: encoder -> two-stage -> pose decoder.

        Args:
            mlvl_feats: list of (B, T, H_l, W_l, C) neck features.
            mlvl_masks: list of (B, H_l, W_l) bool padding masks (shared
                across frames of a clip).
            valid_ratios: (B, L, 2) xy valid fractions per level.

        Returns a dict of outputs (see code).
        """
        B, T = mlvl_feats[0].shape[:2]
        C, K = self.embed_dims, self.num_keypoints
        spatial_shapes: Shapes = tuple(
            (f.shape[2], f.shape[3]) for f in mlvl_feats)

        feat_flat, mask_flat, pos_flat = [], [], []
        for lvl, (feat, mask) in enumerate(zip(mlvl_feats, mlvl_masks)):
            H, W = spatial_shapes[lvl]
            feat_flat.append(feat.reshape(B, T, H * W, C))
            mask_flat.append(mask.reshape(B, H * W))
            pos = sine_positional_encoding(mask, num_feats=C // 2,
                                           dtype=self.dtype)
            pos_flat.append(pos.reshape(B, H * W, C)
                            + self.level_embeds[lvl][None, None])
        feat = jnp.concatenate(feat_flat, 2)          # (B, T, N, C)
        mask = jnp.concatenate(mask_flat, 1)          # (B, N)
        pos = jnp.concatenate(pos_flat, 1)            # (B, N, C)
        N = feat.shape[2]

        # --- encoder over all frames (frame folded into batch) ---
        enc_ref = self.encoder_reference_points(spatial_shapes, valid_ratios)
        x = feat.reshape(B * T, N, C)
        pos_bt = jnp.broadcast_to(
            pos[:, None], (B, T, N, C)).reshape(B * T, N, C)
        mask_bt = jnp.broadcast_to(mask[:, None], (B, T, N)).reshape(
            B * T, N)
        ref_bt = jnp.broadcast_to(
            enc_ref[:, None], (B, T, N, self.num_levels, 2)).reshape(
                B * T, N, self.num_levels, 2)
        for layer in self.encoder_layers:
            x = layer(x, pos_bt, ref_bt, spatial_shapes, mask_bt,
                      deterministic=deterministic)
        memory = x.reshape(B, T, N, C)
        now = T // 2
        now_memory = memory[:, now]

        hm_outs = {}
        if self.with_heatmap and return_heatmap:
            h0, w0 = spatial_shapes[0]
            n0 = h0 * w0
            # no positional embedding: the reference passes it under the
            # misspelled kwarg ``query_pose`` (``transformer.py:4565``),
            # so its hm encoder runs position-free; matched for
            # converted-checkpoint compatibility
            hm_mem = self.hm_encoder_layer(
                now_memory[:, :n0], jnp.zeros_like(pos[:, :n0]),
                enc_ref[:, :n0, :1], (spatial_shapes[0],), mask[:, :n0],
                deterministic=deterministic)
            hm_outs["hm_pred"] = self.fc_hm(hm_mem).reshape(B, h0, w0, K)
            hm_outs["hm_mask"] = mlvl_masks[0]

        # --- two-stage proposals from the current frame ---
        proposals_logit, prop_valid = self.gen_proposals(
            spatial_shapes,
            valid_ratios * jnp.asarray(
                [[ [w, h] for h, w in spatial_shapes ]], jnp.float32),
            mask)
        out_mem = jnp.where(prop_valid[..., None], now_memory, 0.0)
        out_mem = self.enc_output_norm(self.enc_output(out_mem))

        enc_cls = self.cls_branches[-1](out_mem)          # (B, N, 1)
        enc_kpt_unact = self.kpt_branches[-1](out_mem)    # (B, N, 2K)
        enc_kpt_unact = (enc_kpt_unact.reshape(B, N, K, 2)
                         + proposals_logit[:, :, None, :]).reshape(
                             B, N, 2 * K)
        enc_sigma = self.sigma_branches[-1](out_mem)      # (B, N, 2K)

        # topk proposals; invalid positions pushed out of the running
        # (the reference relies on zeroed memory giving bias-level scores)
        topk_scores = jnp.where(prop_valid, enc_cls[..., 0], -1e4)
        _, topk_idx = jax.lax.top_k(topk_scores, self.num_query)
        gather = lambda a: jnp.take_along_axis(
            a, topk_idx[..., None], axis=1)
        topk_kpts_unact = jax.lax.stop_gradient(gather(enc_kpt_unact))
        tgt = jax.lax.stop_gradient(gather(out_mem))

        # --- pose decoder ---
        query_pos, query_content = jnp.split(self.query_embedding, 2, -1)
        if self.query_from_encoder_token:
            query = tgt + query_content[None]
        else:
            query = jnp.broadcast_to(query_content[None],
                                     (B, self.num_query, C))
        query_pos = jnp.broadcast_to(query_pos[None],
                                     (B, self.num_query, C))
        ref = jax.nn.sigmoid(topk_kpts_unact)            # (B, Q, 2K)
        ref = jnp.broadcast_to(ref[:, None],
                               (B, T, self.num_query, 2 * K))
        init_reference = ref

        vr_k = jnp.tile(valid_ratios, (1, 1, K))          # (B, L, 2K)
        hs_list, refs_list = [], []
        for lid in range(self.num_decoder_layers):
            query = self.dec_self_attns[lid](
                query, query_pos=query_pos, deterministic=deterministic)
            query = self.dec_norms1[lid](query)
            ref_input = ref[:, :, :, None, :] * vr_k[:, None, None]
            query = self.dec_cross_attns[lid](
                query, value=memory, reference_points=ref_input,
                spatial_shapes=spatial_shapes,
                key_padding_mask=jnp.broadcast_to(mask[:, None], (B, T, N)),
                query_pos=query_pos, deterministic=deterministic)
            query = self.dec_norms2[lid](query)
            query = self.dec_ffns[lid](query, deterministic=deterministic)
            query = self.dec_norms3[lid](query)

            # per-frame reference refinement (decoder V2; no detach,
            # reference ``transformer.py:6729-6746``)
            deltas = []
            aux_i = 0
            for t in range(T):
                if t == now:
                    deltas.append(self.kpt_branches[lid](query))
                else:
                    deltas.append(self.aux_kpt_branches[aux_i][lid](query))
                    aux_i += 1
            delta = jnp.stack(deltas, 1)                 # (B, T, Q, 2K)
            ref = jax.nn.sigmoid(delta + inverse_sigmoid(ref))
            hs_list.append(query)
            refs_list.append(ref)
            if self.detach_decoder_refs:
                # gradient reaches each layer's output through its own
                # branch only (PETR semantics); head outputs above keep
                # the undetached refs_list entries
                ref = jax.lax.stop_gradient(ref)

        # per-layer head outputs; outputs_kpts[l] == refs_list[l][:, now]
        outputs_classes = jnp.stack(
            [self.cls_branches[l](hs_list[l])
             for l in range(self.num_decoder_layers)])
        outputs_kpts = jnp.stack([r[:, now] for r in refs_list])
        outputs_sigmas = jnp.stack(
            [jax.nn.sigmoid(self.sigma_branches[l](hs_list[l]))
             for l in range(self.num_decoder_layers)])

        return dict(
            all_cls_scores=outputs_classes,       # (D, B, Q, 1)
            all_kpt_preds=outputs_kpts,           # (D, B, Q, 2K)
            all_sigma_preds=outputs_sigmas,       # (D, B, Q, 2K)
            enc_cls_scores=enc_cls,               # (B, N, 1)
            enc_kpt_preds=jax.nn.sigmoid(enc_kpt_unact),
            enc_sigma_preds=jax.nn.sigmoid(enc_sigma),
            frame_kpt_preds=refs_list[-1],        # (B, T, Q, 2K)
            init_reference=init_reference,
            memory=memory,                        # (B, T, N, C)
            mask_flatten=mask,                    # (B, N)
            spatial_shapes=spatial_shapes,
            **hm_outs,
        )

    def forward_refine(self, memory, mask_flatten, valid_ratios,
                       ref_poses, spatial_shapes: Shapes,
                       deterministic: bool = True):
        """Joint decoder: K keypoint queries per pose candidate.

        Args:
            memory: (B, T, N, C) encoder output.
            mask_flatten: (B, N).
            valid_ratios: (B, L, 2).
            ref_poses: (B, M, T, K*2) normalized pose candidates per frame
                (training: matched predictions; inference: top-k), already
                detached by the caller.

        Returns (refine_kpts (R,B,M,K,2), scores (R,B,M,K,1),
                 sigmas (R,B,M,K,2)).
        """
        B, T, N, C = memory.shape
        M = ref_poses.shape[1]
        K = self.num_keypoints
        now = T // 2

        qp, qc = jnp.split(self.refine_query_embedding, 2, -1)  # (K, C)
        query = jnp.broadcast_to(qc[None, None], (B, M, K, C))
        query_pos = jnp.broadcast_to(qp[None, None], (B, M, K, C))
        ref = ref_poses.reshape(B, M, T, K, 2).transpose(0, 2, 1, 3, 4)
        # (B, T, M, K, 2)

        kpts_out, scores_out, sigmas_out = [], [], []
        for lid in range(self.num_refine_layers):
            q = query.reshape(B * M, K, C)
            q = self.ref_self_attns[lid](
                q, query_pos=query_pos.reshape(B * M, K, C),
                deterministic=deterministic)
            q = self.ref_norms1[lid](q).reshape(B, M, K, C)

            ref_input = (ref.reshape(B, T, M * K, 1, 2)
                         * valid_ratios[:, None, None])  # (B,T,MK,L,2)
            q = self.ref_cross_attns[lid](
                q.reshape(B, M * K, C), value=memory,
                reference_points=ref_input,
                spatial_shapes=spatial_shapes,
                key_padding_mask=jnp.broadcast_to(
                    mask_flatten[:, None], (B, T, N)),
                query_pos=query_pos.reshape(B, M * K, C),
                deterministic=deterministic)
            q = self.ref_norms2[lid](q)
            q = self.ref_ffns[lid](q, deterministic=deterministic)
            q = self.ref_norms3[lid](q).reshape(B, M, K, C)
            query = q

            delta = jnp.stack(
                [self.refine_kpt_branches[t][lid](query) for t in range(T)],
                axis=1)                                   # (B, T, M, K, 2)
            ref = jax.nn.sigmoid(delta + inverse_sigmoid(ref))

            sigma = jax.nn.sigmoid(self.refine_sigma_branches[lid](query))
            score = (1.0 - sigma).mean(-1, keepdims=True)
            kpts_out.append(ref[:, now])
            scores_out.append(score)
            sigmas_out.append(sigma)
            if self.detach_decoder_refs:
                # PETR's stock refine decoder detaches between layers
                # (mmdet ``DeformableDetrTransformerDecoder``); the fork's
                # video V1 decoder deliberately does not
                # (``mmdet/models/utils/transformer.py:875-877``)
                ref = jax.lax.stop_gradient(ref)

        return (jnp.stack(kpts_out), jnp.stack(scores_out),
                jnp.stack(sigmas_out))
