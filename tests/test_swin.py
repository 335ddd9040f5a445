"""Swin backbone tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pavenet_tpu.models.backbones.swin import (
    SwinTransformer, window_partition, window_reverse)


def test_window_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 14, 28, 8).astype(np.float32)
    w = window_partition(jnp.asarray(x), 7)
    assert w.shape == (2 * 2 * 4, 49, 8)
    back = window_reverse(w, 7, 14, 28)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_tiny_swin_shapes():
    model = SwinTransformer(embed_dims=24, depths=(1, 1, 2, 1),
                            num_heads=(2, 2, 4, 4), window_size=4,
                            out_indices=(1, 2, 3))
    x = np.random.RandomState(0).randn(1, 63, 95, 3).astype(np.float32)
    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()
    outs = jax.jit(lambda v: model.apply(v, x))(v)
    # patch 4 -> 16x24; merges: /2 per stage
    assert outs[0].shape == (1, 8, 12, 48)
    assert outs[1].shape == (1, 4, 6, 96)
    assert outs[2].shape == (1, 2, 3, 192)
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_swin_attention_matches_torch_window_msa():
    """WindowMSA parity vs a direct torch re-computation of the same math."""
    torch = pytest.importorskip("torch")
    from pavenet_tpu.models.backbones.swin import WindowMSA, \
        relative_position_index

    C, H_, ws = 16, 4, 4
    m = WindowMSA(dim=C, num_heads=H_, window_size=ws)
    rng = np.random.RandomState(0)
    x = rng.randn(3, ws * ws, C).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(v, jnp.asarray(x)))

    p = v["params"]
    qkv = x @ np.asarray(p["qkv"]["kernel"]) + np.asarray(p["qkv"]["bias"])
    L = ws * ws
    q, k, val = [a.reshape(3, L, H_, C // H_).transpose(0, 2, 1, 3)
                 for a in np.split(qkv, 3, -1)]
    attn = q @ k.transpose(0, 1, 3, 2) / np.sqrt(C // H_)
    table = np.asarray(p["relative_position_bias_table"])
    idx = relative_position_index(ws)
    attn = attn + table[idx.reshape(-1)].reshape(L, L, H_).transpose(
        2, 0, 1)[None]
    attn = torch.softmax(torch.from_numpy(attn), dim=-1).numpy()
    out = (attn @ val).transpose(0, 2, 1, 3).reshape(3, L, C)
    want = out @ np.asarray(p["proj"]["kernel"]) + np.asarray(
        p["proj"]["bias"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_swin_backbone_parity_with_mmdet():
    """Converted mmdet SwinTransformer weights reproduce the reference
    backbone's stage outputs (``mmdet/models/backbones/swin.py``;
    shifted windows, patch merging unfold order, output norms)."""
    torch = pytest.importorskip("torch")
    import sys
    from reference_oracle import install_stubs, REFERENCE_ROOT
    install_stubs()
    for p in (f"{REFERENCE_ROOT}/third_party/mmdetection", REFERENCE_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    from mmdet.models.backbones.swin import SwinTransformer as RefSwin
    from pavenet_tpu.utils.weight_convert import _swin, _StateDict

    torch.manual_seed(0)
    depths, heads = (2, 2, 2, 2), (2, 4, 8, 16)
    ref = RefSwin(embed_dims=32, depths=depths, num_heads=heads,
                  window_size=4, out_indices=(1, 2, 3),
                  drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0)
    ref.init_weights()
    ref.eval()

    rng = np.random.RandomState(0)
    # non-divisible size to exercise padding; small enough that stage-3
    # maps are below the window size (mmdet still shifts there)
    x = rng.randn(1, 3, 60, 92).astype(np.float32)
    with torch.no_grad():
        outs_t = ref(torch.from_numpy(x))

    sd = _StateDict({f"backbone.{k}": v.numpy()
                     for k, v in ref.state_dict().items()})
    params = _swin(sd, depths=depths, out_indices=(1, 2, 3))
    assert not [k for k in sd.unused()
                if "relative_position_index" not in k], sd.unused()[:8]

    mine = SwinTransformer(embed_dims=32, depths=depths, num_heads=heads,
                           window_size=4, out_indices=(1, 2, 3))
    outs = jax.jit(lambda p, x: mine.apply(p, x))(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    for i, (got, want) in enumerate(zip(outs, outs_t)):
        want = want.numpy().transpose(0, 2, 3, 1)
        assert got.shape == want.shape, (i, got.shape, want.shape)
        diff = np.abs(np.asarray(got) - want).max()
        assert diff < 2e-4, (i, diff)
