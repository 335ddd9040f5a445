"""Pallas msda kernel parity (runs only when a TPU is attached)."""
import numpy as np
import pytest
import jax

from pavenet_tpu.ops import ms_deform_attn_xla

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas TPU kernel needs a TPU")


@tpu_only
def test_pallas_matches_xla_including_adversarial_spans():
    from pavenet_tpu.ops.pallas.msda import ms_deform_attn_pallas

    rng = np.random.RandomState(0)
    SH = ((9, 13), (5, 7), (3, 4))
    N = sum(h * w for h, w in SH)
    v = rng.randn(2, N, 4, 32).astype(np.float32)
    loc = (rng.rand(2, 11, 4, 3, 4, 2) * 1.2 - 0.1).astype(np.float32)
    w = rng.rand(2, 11, 4, 3, 4).astype(np.float32)
    w /= w.reshape(2, 11, 4, -1).sum(-1).reshape(2, 11, 4, 1, 1)
    want = np.asarray(ms_deform_attn_xla(v, SH, loc, w))
    got = np.asarray(jax.jit(
        lambda a, b, c: ms_deform_attn_pallas(a, SH, b, c))(v, loc, w))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # adversarial: fully random (global) sampling locations -> long tile
    # spans exercising the dynamic tail
    SH2 = ((40, 52), (20, 26))
    N2 = sum(h * w for h, w in SH2)
    v2 = rng.randn(1, N2, 2, 32).astype(np.float32)
    loc2 = rng.rand(1, 77, 2, 2, 4, 2).astype(np.float32)
    w2 = rng.rand(1, 77, 2, 2, 4).astype(np.float32)
    want2 = np.asarray(ms_deform_attn_xla(v2, SH2, loc2, w2))
    got2 = np.asarray(jax.jit(
        lambda a, b, c: ms_deform_attn_pallas(a, SH2, b, c))(v2, loc2, w2))
    np.testing.assert_allclose(got2, want2, atol=1e-5)


@tpu_only
def test_pallas_fused_backward_matches_xla_grads():
    """The fused backward kernel (VMEM grad_value scatter + per-tap value
    dots) must match AD of the XLA formulation on all three inputs."""
    import jax.numpy as jnp
    from pavenet_tpu.ops.pallas.msda import ms_deform_attn_pallas

    rng = np.random.RandomState(1)
    for SH, B, Q, H, Dh in [
        (((9, 13), (5, 7), (3, 4)), 2, 11, 4, 32),
        (((40, 52), (20, 26)), 1, 77, 2, 32),  # long spans -> dynamic tail
    ]:
        N = sum(h * w for h, w in SH)
        L = len(SH)
        v = rng.randn(B, N, H, Dh).astype(np.float32)
        loc = (rng.rand(B, Q, H, L, 4, 2) * 1.2 - 0.1).astype(np.float32)
        w = rng.rand(B, Q, H, L, 4).astype(np.float32)
        w /= w.reshape(B, Q, H, -1).sum(-1).reshape(B, Q, H, 1, 1)
        g = rng.randn(B, Q, H * Dh).astype(np.float32)

        gx = jax.jit(jax.grad(
            lambda *a: jnp.vdot(ms_deform_attn_xla(a[0], SH, a[1], a[2]), g),
            argnums=(0, 1, 2)))(v, loc, w)
        gp = jax.jit(jax.grad(
            lambda *a: jnp.vdot(
                ms_deform_attn_pallas(a[0], SH, a[1], a[2]), g),
            argnums=(0, 1, 2)))(v, loc, w)
        for name, a, b in zip(("g_val", "g_loc", "g_attn"), gx, gp):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1.0
            np.testing.assert_allclose(b, a, atol=1e-4 * scale,
                                       err_msg=f"{SH} {name}")


@tpu_only
def test_pallas_two_level_tail_probe_sets():
    """Spans 5..8 ride the top-anchored tail probes; spans > 8 the fori
    middle; a wide level (W=200) overflows structurally at row wraps.
    All must match the XLA oracle for the forward AND all three grads.

    NOTE inputs are passed as jit arguments on purpose: closure-captured
    inputs become program constants and the XLA branch constant-folds
    with different numerics (bogus ~60x gloc mismatches)."""
    import jax.numpy as jnp
    from pavenet_tpu.ops.pallas.msda import ms_deform_attn_pallas

    rng = np.random.RandomState(7)
    for SH, B, Q, H, spread in [
        (((40, 52), (20, 26)), 1, 96, 2, 0.08),   # tail-probe spans
        (((16, 200),), 1, 64, 2, 0.05),           # wide level, row wraps
        (((40, 52), (20, 26)), 1, 77, 2, None),   # global -> fori middle
    ]:
        L = len(SH)
        N = sum(h * w for h, w in SH)
        v = rng.randn(1 * B, N, H, 32).astype(np.float32)
        if spread is None:
            loc = (rng.rand(B, Q, H, L, 4, 2) * 1.4 - 0.2)
        else:
            loc = (rng.rand(B, Q, H, 1, 1, 2)
                   + rng.randn(B, Q, H, L, 4, 2) * spread)
        loc = loc.astype(np.float32)
        w = rng.rand(B, Q, H, L, 4).astype(np.float32)
        w /= w.reshape(B, Q, H, -1).sum(-1).reshape(B, Q, H, 1, 1)
        g = rng.randn(B, Q, H * 32).astype(np.float32)

        @jax.jit
        def diff(v, loc, w, g):
            def pair(fn):
                out, vjp = jax.vjp(lambda *a: fn(a[0], SH, a[1], a[2]),
                                   v, loc, w)
                return (out,) + vjp(g)
            outs_p = pair(ms_deform_attn_pallas)
            outs_x = pair(ms_deform_attn_xla)
            return [jnp.max(jnp.abs(a - b)) for a, b in zip(outs_p, outs_x)]

        errs = [float(e) for e in diff(v, loc, w, g)]
        for name, e in zip(("out", "gval", "gloc", "gattn"), errs):
            assert e < 5e-4, (SH, spread, name, errs)


@tpu_only
def test_corner_stream_kernel_fwd_and_grads():
    """Second-generation corner-stream kernel (ops/pallas/msda_cs.py):
    forward parity on all tail regimes plus grads through its hybrid VJP
    (cs forward + first-gen fused backward)."""
    import jax.numpy as jnp
    from pavenet_tpu.ops.pallas.msda_cs import ms_deform_attn_cs

    rng = np.random.RandomState(11)
    for SH, B, Q, H, spread in [
        (((24, 32), (12, 16)), 2, 64, 4, 0.02),   # static window only
        (((40, 52), (20, 26)), 1, 96, 2, 0.08),   # tail-probe spans
        (((16, 200),), 1, 64, 2, 0.05),           # wide level, row wraps
        (((40, 52), (20, 26)), 1, 77, 2, None),   # global -> fori middle
    ]:
        L = len(SH)
        N = sum(h * w for h, w in SH)
        v = rng.randn(B, N, H, 32).astype(np.float32)
        if spread is None:
            loc = (rng.rand(B, Q, H, L, 4, 2) * 1.4 - 0.2)
        else:
            loc = (rng.rand(B, Q, H, 1, 1, 2)
                   + rng.randn(B, Q, H, L, 4, 2) * spread)
        loc = loc.astype(np.float32)
        w = rng.rand(B, Q, H, L, 4).astype(np.float32)
        w /= w.reshape(B, Q, H, -1).sum(-1).reshape(B, Q, H, 1, 1)
        g = rng.randn(B, Q, H * 32).astype(np.float32)

        @jax.jit
        def diff(v, loc, w, g):
            def pair(fn):
                out, vjp = jax.vjp(lambda *a: fn(a[0], SH, a[1], a[2]),
                                   v, loc, w)
                return (out,) + vjp(g)
            outs_p = pair(ms_deform_attn_cs)
            outs_x = pair(ms_deform_attn_xla)
            return [jnp.max(jnp.abs(a - b)) for a, b in zip(outs_p, outs_x)]

        errs = [float(e) for e in diff(v, loc, w, g)]
        for name, e in zip(("out", "gval", "gloc", "gattn"), errs):
            assert e < 5e-4, (SH, spread, name, errs)


@tpu_only
def test_bf16_kernels_within_bf16_floor():
    """bf16 inputs route the in-kernel one-hot contractions to the
    single-pass bf16 MXU (``_mxu_precision``): outputs and fused-backward
    grads must stay within the bf16 activation quantization floor of the
    f32 oracle (f32 inputs keep the exact 6-pass path — covered by the
    other tests here)."""
    import jax.numpy as jnp
    from pavenet_tpu.ops.pallas.msda import ms_deform_attn_pallas
    from pavenet_tpu.ops.pallas.msda_cs import ms_deform_attn_cs

    rng = np.random.RandomState(7)
    SH = ((24, 32), (12, 16))
    N = sum(h * w for h, w in SH)
    v = rng.randn(2, N, 4, 32).astype(np.float32)
    loc = (rng.rand(2, 64, 4, 2, 4, 2) * 1.2 - 0.1).astype(np.float32)
    w = rng.rand(2, 64, 4, 2, 4).astype(np.float32)
    w /= w.reshape(2, 64, 4, -1).sum(-1).reshape(2, 64, 4, 1, 1)
    g = rng.randn(2, 64, 128).astype(np.float32)
    # oracle sees the SAME bf16-quantized inputs (upcast to f32), so the
    # only delta under test is the kernels' internal contraction precision
    vb = np.asarray(jnp.asarray(v, jnp.bfloat16), np.float32)
    locb = np.asarray(jnp.asarray(loc, jnp.bfloat16), np.float32)
    wb = np.asarray(jnp.asarray(w, jnp.bfloat16), np.float32)
    gb = np.asarray(jnp.asarray(g, jnp.bfloat16), np.float32)
    want = jax.vjp(lambda *a: ms_deform_attn_xla(a[0], SH, a[1], a[2]),
                   vb, locb, wb)
    want_out, want_vjp = np.asarray(want[0]), want[1](gb)

    for kern in (ms_deform_attn_pallas, ms_deform_attn_cs):
        @jax.jit
        def run(v, loc, w, g, kern=kern):
            out, vjp = jax.vjp(
                lambda *a: kern(a[0].astype(jnp.bfloat16), SH,
                                a[1].astype(jnp.bfloat16),
                                a[2].astype(jnp.bfloat16)), v, loc, w)
            return (out,) + vjp(g.astype(jnp.bfloat16))
        out, gv, gl, ga = run(v, loc, w, g)
        assert np.abs(np.asarray(out, np.float32) - want_out).max() < 0.05, (
            kern.__name__, np.abs(np.asarray(out, np.float32)
                                  - want_out).max())
        for name, got, ref, tol in (("gval", gv, want_vjp[0], 0.05),
                                    ("gloc", gl, want_vjp[1], 0.1),
                                    ("gattn", ga, want_vjp[2], 0.05)):
            ref = np.asarray(ref, np.float32)
            got = np.asarray(got, np.float32)
            scale = max(1.0, np.abs(ref).max())
            assert np.abs(got - ref).max() / scale < tol, (
                kern.__name__, name, np.abs(got - ref).max(), scale)
