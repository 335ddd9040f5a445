"""Module-level parity: flax attention vs the reference PyTorch modules.

Weights are initialized in torch, converted to flax params, and outputs
diffed within fp32 tolerance — the activation-parity gate of SURVEY.md §7.7.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_oracle import load_mmcv_attention
from pavenet_tpu.models.attention.deformable import (
    MultiScaleDeformableAttention, MultiFrameDeformableAttention)

SHAPES = ((8, 12), (4, 6))
N = sum(h * w for h, w in SHAPES)
C, HEADS, L, P, Q, B, T = 64, 4, 2, 3, 10, 2, 3


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def linear_params(linear):
    return {"kernel": t2j(linear.weight).T, "bias": t2j(linear.bias)}


def test_single_frame_attention_parity():
    ref_mod = load_mmcv_attention()
    torch.manual_seed(0)
    ref = ref_mod.MultiScaleDeformableAttention(
        embed_dims=C, num_heads=HEADS, num_levels=L, num_points=P,
        dropout=0.0, batch_first=True).eval()

    mine = MultiScaleDeformableAttention(
        embed_dims=C, num_heads=HEADS, num_levels=L, num_points=P,
        dropout=0.0)
    params = {"params": {
        "value_proj": linear_params(ref.value_proj),
        "output_proj": linear_params(ref.output_proj),
        "sampling_offsets": linear_params(ref.sampling_offsets),
        "attention_weights": linear_params(ref.attention_weights),
    }}

    rng = np.random.RandomState(0)
    query = rng.randn(B, Q, C).astype(np.float32)
    value = rng.randn(B, N, C).astype(np.float32)
    refpts = rng.rand(B, Q, L, 2).astype(np.float32)
    mask = np.zeros((B, N), bool)
    mask[:, -7:] = True

    with torch.no_grad():
        want = ref(
            torch.from_numpy(query),
            value=torch.from_numpy(value),
            reference_points=torch.from_numpy(refpts),
            spatial_shapes=torch.tensor(SHAPES),
            level_start_index=torch.tensor([0, SHAPES[0][0] * SHAPES[0][1]]),
            key_padding_mask=torch.from_numpy(mask)).numpy()

    got = np.asarray(mine.apply(
        params, jnp.asarray(query), jnp.asarray(value), jnp.asarray(refpts),
        SHAPES, key_padding_mask=jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_multi_frame_attention_parity():
    ref_mod = load_mmcv_attention()
    torch.manual_seed(1)
    ref = ref_mod.MulFramesMultiScaleDeformableAttentionNumFrames3(
        embed_dims=C, num_heads=HEADS, num_levels=L, num_points=P,
        dropout=0.0, batch_first=True).eval()

    mine = MultiFrameDeformableAttention(
        num_frames=T, embed_dims=C, num_heads=HEADS, num_levels=L,
        num_points=P, dropout=0.0)

    def fused(frames_mods):
        ks = [linear_params(m) for m in frames_mods]
        return {"kernel": jnp.concatenate([k["kernel"] for k in ks], -1),
                "bias": jnp.concatenate([k["bias"] for k in ks], -1)}

    params = {"params": {
        "value_proj": linear_params(ref.value_proj),
        "output_proj": linear_params(ref.output_proj),
        "sampling_offsets": fused([ref.pre_sampling_offsets,
                                   ref.sampling_offsets,
                                   ref.next_sampling_offsets]),
        "attention_weights": fused([ref.pre_attention_weights,
                                    ref.attention_weights,
                                    ref.next_attention_weights]),
    }}

    rng = np.random.RandomState(2)
    query = rng.randn(B, Q, C).astype(np.float32)
    value = rng.randn(B, N, T, C).astype(np.float32)   # ref layout
    # per-frame 2d reference points, stacked frames along batch (ref layout)
    refpts = rng.rand(T * B, Q, L, 2).astype(np.float32)

    with torch.no_grad():
        want = ref(
            torch.from_numpy(query),
            value=torch.from_numpy(value),
            reference_points=torch.from_numpy(refpts),
            spatial_shapes=torch.tensor(SHAPES),
            level_start_index=torch.tensor([0, SHAPES[0][0] * SHAPES[0][1]]),
        ).numpy()

    # my layout: value (B, T, N, C); refs (B, T, Q, L, 2)
    value_mine = value.transpose(0, 2, 1, 3)
    refs_mine = refpts.reshape(T, B, Q, L, 2).transpose(1, 0, 2, 3, 4)
    got = np.asarray(mine.apply(
        {"params": params["params"]},
        jnp.asarray(query), jnp.asarray(value_mine),
        jnp.asarray(refs_mine), SHAPES))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
