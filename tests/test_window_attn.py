"""Fused Pallas window-attention kernel (ops/pallas/window_attn.py).

CPU tests run the kernel in interpret mode and check it against the
XLA partition path of ``WindowedEncoderLayer`` (same parameters, same
inputs — forward and gradients).  A TPU-gated test re-checks the
compiled kernel on hardware (PAVENET_TEST_TPU=1).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pavenet_tpu.models.layers.windowed import WindowedEncoderLayer

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="compiled kernel needs a TPU")

SHAPES = ((9, 17), (5, 7))            # both levels pad to window multiples
N = sum(h * w for h, w in SHAPES)


def _layer_pair(C=32, heads=4, shift=False):
    kw = dict(embed_dims=C, num_heads=heads, feedforward_channels=64,
              dropout=0.0, shift=shift)
    return (WindowedEncoderLayer(impl="xla", **kw),
            WindowedEncoderLayer(impl="pallas", **kw))


def _inputs(C=32, B=2, masked=True, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    pos = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    if not masked:
        return x, pos, None
    mask = np.zeros((B, N), bool)
    start = 0
    for (Hl, Wl) in SHAPES:                    # right/bottom bucket padding
        m2 = np.zeros((Hl, Wl), bool)
        m2[:, -3:] = True
        m2[-2:, :] = True
        mask[:, start:start + Hl * Wl] = m2.reshape(-1)
        start += Hl * Wl
    return x, pos, jnp.asarray(mask)


@pytest.mark.parametrize("shift", [False, True])
@pytest.mark.parametrize("masked", [False, True])
def test_pallas_layer_matches_xla_layer(shift, masked):
    xla, pal = _layer_pair(shift=shift)
    x, pos, mask = _inputs(masked=masked)
    variables = xla.init(jax.random.PRNGKey(0), x, pos, None, SHAPES, mask)
    want = xla.apply(variables, x, pos, None, SHAPES, mask)
    got = pal.apply(variables, x, pos, None, SHAPES, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_pallas_gradients_match_xla():
    xla, pal = _layer_pair(shift=True)
    x, pos, mask = _inputs()
    variables = xla.init(jax.random.PRNGKey(0), x, pos, None, SHAPES, mask)

    def loss(layer, xx, vv):
        out = layer.apply(vv, xx, pos, None, SHAPES, mask)
        return jnp.sum(out * out)

    gx_want, gv_want = jax.grad(
        lambda xx, vv: loss(xla, xx, vv), argnums=(0, 1))(x, variables)
    gx_got, gv_got = jax.grad(
        lambda xx, vv: loss(pal, xx, vv), argnums=(0, 1))(x, variables)
    np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_want),
                               atol=3e-4, rtol=1e-4)
    flat_w, _ = jax.tree_util.tree_flatten_with_path(gv_want)
    flat_g = dict(jax.tree_util.tree_flatten_with_path(gv_got)[0])
    for path, w in flat_w:
        np.testing.assert_allclose(
            np.asarray(flat_g[path]), np.asarray(w), atol=3e-4, rtol=1e-4,
            err_msg=str(path))


def test_kernel_against_plain_jnp():
    """Direct kernel check vs an explicit per-window softmax-attention."""
    from pavenet_tpu.ops.pallas.window_attn import window_attention

    wh, ww, C, Hn = 8, 16, 16, 2
    B, Hp, Wp = 2, 16, 32
    rng = np.random.RandomState(3)
    q, k, v = (jnp.asarray(rng.randn(B, Hp, Wp, C).astype(np.float32))
               for _ in range(3))
    keep = jnp.asarray((rng.rand(B, Hp, Wp) > 0.3).astype(np.float32))
    got = window_attention(q, k, v, keep, Hn, wh, ww, True)

    D = C // Hn
    want = np.zeros((B, Hp, Wp, C), np.float32)
    for b in range(B):
        for i in range(Hp // wh):
            for j in range(Wp // ww):
                sl = (b, slice(i * wh, (i + 1) * wh),
                      slice(j * ww, (j + 1) * ww))
                qw = np.asarray(q[sl]).reshape(-1, C)
                kw = np.asarray(k[sl]).reshape(-1, C)
                vw = np.asarray(v[sl]).reshape(-1, C)
                kp = np.asarray(keep[sl]).reshape(-1) > 0.5
                ow = np.zeros_like(qw)
                for h in range(Hn):
                    hs = slice(h * D, (h + 1) * D)
                    s = qw[:, hs] @ kw[:, hs].T / np.sqrt(D)
                    s = np.where(kp[None, :], s, -1e9)
                    e = np.exp(s - s.max(-1, keepdims=True))
                    a = e / e.sum(-1, keepdims=True)
                    ow[:, hs] = a @ vw[:, hs]
                want[sl] = ow.reshape(wh, ww, C)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@tpu_only
def test_compiled_kernel_matches_xla_layer_on_tpu():
    for shift in (False, True):
        xla, pal = _layer_pair(C=256, heads=8, shift=shift)
        x, pos, mask = _inputs(C=256, seed=7)
        variables = jax.jit(lambda: xla.init(
            jax.random.PRNGKey(0), x, pos, None, SHAPES, mask))()
        want = jax.jit(lambda v: xla.apply(
            v, x, pos, None, SHAPES, mask))(variables)
        got = jax.jit(lambda v: pal.apply(
            v, x, pos, None, SHAPES, mask))(variables)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)
