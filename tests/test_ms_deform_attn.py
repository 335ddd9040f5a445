"""Parity tests for the ms-deform-attn op.

Oracle: torch ``F.grid_sample``-based multi-scale deformable attention — the
same reference math the upstream CUDA kernel is validated against
(``third_party/mmcv/tests/test_ops/test_ms_deformable_attn.py:73``).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pavenet_tpu.ops import ms_deform_attn_xla

SHAPES = ((6, 9), (4, 6), (2, 3))


def torch_oracle(value, shapes, locs, weights):
    import torch
    import torch.nn.functional as F

    value = torch.from_numpy(value)
    locs = torch.from_numpy(locs)
    weights = torch.from_numpy(weights)
    bs, _, nh, d = value.shape
    _, q, _, L, P, _ = locs.shape
    splits = [h * w for h, w in shapes]
    value_list = value.split(splits, dim=1)
    grids = 2 * locs - 1
    sampled = []
    for lvl, (h, w) in enumerate(shapes):
        v = value_list[lvl].flatten(2).transpose(1, 2).reshape(
            bs * nh, d, h, w)
        g = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
        sampled.append(s)
    w_ = weights.transpose(1, 2).reshape(bs * nh, 1, q, L * P)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * w_).sum(-1)
    return out.view(bs, nh * d, q).transpose(1, 2).numpy()


def make_inputs(seed=0, bs=2, q=7, nh=2, d=4, P=3, dtype=np.float32):
    rng = np.random.RandomState(seed)
    n = sum(h * w for h, w in SHAPES)
    L = len(SHAPES)
    value = rng.randn(bs, n, nh, d).astype(dtype)
    locs = rng.rand(bs, q, nh, L, P, 2).astype(dtype) * 1.2 - 0.1  # some OOB
    w = rng.rand(bs, q, nh, L, P).astype(dtype)
    w = w / w.reshape(bs, q, nh, -1).sum(-1).reshape(bs, q, nh, 1, 1)
    return value, locs, w


def test_forward_matches_torch_grid_sample():
    value, locs, w = make_inputs()
    got = np.asarray(ms_deform_attn_xla(value, SHAPES, locs, w))
    want = torch_oracle(value, SHAPES, locs, w)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_forward_out_of_range_is_zero():
    value, locs, w = make_inputs()
    locs = np.full_like(locs, 5.0)  # every tap far outside every level
    got = np.asarray(ms_deform_attn_xla(value, SHAPES, locs, w))
    np.testing.assert_allclose(got, 0.0, atol=1e-7)


def test_gradients_match_torch():
    import torch
    import torch.nn.functional as F

    value, locs, w = make_inputs(seed=1, bs=1, q=4)

    def loss_jax(v, l, a):
        out = ms_deform_attn_xla(v, SHAPES, l, a)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size,
                                                dtype=out.dtype)
                                     .reshape(out.shape)))

    gv, gl, ga = jax.grad(loss_jax, argnums=(0, 1, 2))(value, locs, w)

    tv = torch.tensor(value, requires_grad=True)
    tl = torch.tensor(locs, requires_grad=True)
    ta = torch.tensor(w, requires_grad=True)
    bs, _, nh, d = value.shape
    q = locs.shape[1]
    splits = [h * w_ for h, w_ in SHAPES]
    value_list = tv.split(splits, dim=1)
    grids = 2 * tl - 1
    sampled = []
    for lvl, (h, w_) in enumerate(SHAPES):
        v = value_list[lvl].flatten(2).transpose(1, 2).reshape(
            bs * nh, d, h, w_)
        g = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
        sampled.append(
            F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False))
    w2 = ta.transpose(1, 2).reshape(bs * nh, 1, q, len(SHAPES) * 3)
    out = ((torch.stack(sampled, dim=-2).flatten(-2) * w2).sum(-1)
           .view(bs, nh * d, q).transpose(1, 2))
    cosw = torch.cos(torch.arange(out.numel(), dtype=out.dtype)
                     .reshape(out.shape))
    (out * cosw).sum().backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(),
                               rtol=1e-4, atol=1e-5)
    # location grads can disagree exactly on bilinear cell boundaries;
    # inputs are random so boundaries have measure zero.
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_bf16_runs_and_is_close():
    value, locs, w = make_inputs()
    out32 = np.asarray(ms_deform_attn_xla(value, SHAPES, locs, w))
    out16 = np.asarray(
        ms_deform_attn_xla(value.astype(jnp.bfloat16), SHAPES,
                           locs.astype(jnp.bfloat16),
                           w.astype(jnp.bfloat16))).astype(np.float32)
    assert np.abs(out16 - out32).max() < 0.1


def test_pallas_split_matches_xla_on_tpu():
    """P=15 point-folding path (pose attention shapes) vs the XLA oracle;
    TPU-only (the split path reuses the Pallas kernel)."""
    import jax
    import pytest as _pytest
    if jax.default_backend() != "tpu":
        _pytest.skip("pallas_split needs a TPU")
    import numpy as np
    import jax.numpy as jnp
    from pavenet_tpu.ops.ms_deform_attn import (
        ms_deform_attn, ms_deform_attn_xla)

    SH = ((9, 13), (5, 7))
    N = sum(h * w for h, w in SH)
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(1, N, 2, 16), jnp.float32)
    loc = jnp.asarray(rng.rand(1, 20, 2, 2, 15, 2), jnp.float32)
    w = rng.rand(1, 20, 2, 2, 15).astype(np.float32)
    w = jnp.asarray(w / w.sum((-1, -2), keepdims=True))
    got = np.asarray(jax.jit(lambda a, b, c: ms_deform_attn(
        a, SH, b, c, impl="pallas_split"))(v, loc, w))
    want = np.asarray(ms_deform_attn_xla(v, SH, loc, w))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_row_align_is_exact():
    """Row-aligned query chunking (``_row_align``/``_row_unalign``) is a
    pure re-layout: running any kernel on the aligned streams and
    dropping the pad rows must reproduce the direct result exactly —
    forward and gradients (pad queries carry zero attention weight, so
    their outputs and cotangents are zero).  Kernel-agnostic check via
    the XLA oracle."""
    from pavenet_tpu.ops.ms_deform_attn import (
        ms_deform_attn_xla, _row_align, _row_unalign)

    SH = ((7, 13), (4, 7), (2, 4))           # query raster == value raster
    N = sum(h * w for h, w in SH)
    rng = np.random.RandomState(3)
    v = jnp.asarray(rng.randn(2, N, 2, 8), jnp.float32)
    loc = jnp.asarray(rng.rand(2, N, 2, 3, 4, 2), jnp.float32)
    w = rng.rand(2, N, 2, 3, 4).astype(np.float32)
    w = jnp.asarray(w / w.sum((-1, -2), keepdims=True))
    g = jnp.asarray(rng.randn(2, N, 16), jnp.float32)

    def direct(v, loc, w):
        return ms_deform_attn_xla(v, SH, loc, w)

    def aligned(v, loc, w):
        lp, wp, segs = _row_align(SH, loc, w)
        return _row_unalign(ms_deform_attn_xla(v, SH, lp, wp), segs)

    out_d, vjp_d = jax.vjp(direct, v, loc, w)
    out_a, vjp_a = jax.vjp(aligned, v, loc, w)
    # tiny atol rather than bitwise: the two XLA programs have different
    # shapes and the compiler may order reductions differently
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_d),
                               atol=1e-6)
    for a, d, name in zip(vjp_a(g), vjp_d(g), ("gval", "gloc", "gattn")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(d),
                                   atol=1e-6, err_msg=name)


def test_row_align_levels_start_chunk_aligned():
    """Every level segment must start on a chunk boundary even when an
    earlier (unpadded) level's token count is not a multiple of the chunk
    size — e.g. the 800x1120 bucket's level 0 (100x140 = 14000 tokens);
    otherwise later padded levels start mid-chunk and their chunks still
    straddle row wraps."""
    from pavenet_tpu.ops.ms_deform_attn import (
        ms_deform_attn_xla, _row_align, _row_unalign, _wrap_can_overflow)

    # level 0: wide raster, never padded (finest), 25*35=875 tokens (not
    # a multiple of 32); levels 1-2 coarse enough to trigger padding
    SH = ((25, 35), (13, 18), (7, 9))
    assert not _wrap_can_overflow(0, SH)
    assert (25 * 35) % 32 != 0
    N = sum(h * w for h, w in SH)
    rng = np.random.RandomState(5)
    v = jnp.asarray(rng.randn(1, N, 2, 8), jnp.float32)
    loc = jnp.asarray(rng.rand(1, N, 2, 3, 4, 2), jnp.float32)
    w = rng.rand(1, N, 2, 3, 4).astype(np.float32)
    w = jnp.asarray(w / w.sum((-1, -2), keepdims=True))

    lp, wp, segs = _row_align(SH, loc, w)
    for (pstart, Hl, Wl, Wp) in segs:
        assert pstart % 32 == 0, segs
    # and the re-layout stays exact
    out_a = _row_unalign(ms_deform_attn_xla(v, SH, lp, wp), segs)
    out_d = ms_deform_attn_xla(v, SH, loc, w)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_d),
                               atol=1e-6)


def test_grad_value_dense_equals_rows():
    """The separable-bilinear dense value gradient (MXU matmuls, the
    decoder-scale path) must equal the row-scatter form (the
    encoder-scale fallback) on every level geometry, including
    degenerate 1-row/1-col levels where the +1 corner term must drop."""
    from pavenet_tpu.ops.ms_deform_attn import (_grad_value_dense,
                                                _grad_value_rows)
    rng = np.random.RandomState(3)
    for shapes in [SHAPES, ((5, 7), (1, 3), (2, 1))]:
        n = sum(h * w for h, w in shapes)
        B, Q, H, L, P, D = 2, 7, 2, len(shapes), 5, 4
        value = jnp.asarray(rng.randn(B, n, H, D), jnp.float32)
        locs = jnp.asarray(rng.rand(B, Q, H, L, P, 2) * 1.4 - 0.2,
                           jnp.float32)  # includes out-of-range taps
        w = jnp.asarray(rng.rand(B, Q, H, L, P), jnp.float32)
        g = jnp.asarray(rng.randn(B, Q, H * D), jnp.float32)
        dense = np.asarray(_grad_value_dense(value, shapes, locs, w, g))
        rows = np.asarray(_grad_value_rows(value, shapes, locs, w, g))
        np.testing.assert_allclose(dense, rows, rtol=1e-5, atol=1e-6)
