"""CPU emulation of the Pallas backward's gloc/gattn math.

Computes vdot per tap directly (no kernel) and pushes it through the same
``_prep_taps`` vjp contraction `_backward` uses, then compares against AD
of the XLA oracle. Discriminates kernel-output bugs from math bugs.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from pavenet_tpu.ops.ms_deform_attn import ms_deform_attn_xla
from pavenet_tpu.ops.pallas import msda as M


def main():
    rng = np.random.RandomState(0)
    SH = ((24, 32), (12, 16))
    B, Q, H, D, P = 2, 64, 4, 32, 4
    L = len(SH)
    N = sum(h * w for h, w in SH)
    value = jnp.asarray(rng.randn(B, N, H, D).astype(np.float32))
    base = rng.rand(B, Q, H, 1, 1, 2)
    loc = jnp.asarray((base + rng.randn(B, Q, H, L, P, 2) * 0.02)
                      .astype(np.float32))
    attn = rng.rand(B, Q, H, L, P).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)
    attn = jnp.asarray(attn)
    g = jnp.asarray(rng.randn(B, Q, H * D).astype(np.float32))

    # oracle
    _, vjp = jax.vjp(lambda l, a: ms_deform_attn_xla(value, SH, l, a),
                     loc, attn)
    gloc_x, gattn_x = vjp(g)

    # emulate the Pallas backward's vdot -> gloc/gattn path on CPU
    tile_base, T_total = M._tile_bases(SH)
    val = M._value_tables(value, SH, T_total)          # (BH, T, D, LANE)
    locs_p, attn_p, Qpad = M._pad_queries(loc, attn)
    idx, w = M._prep_taps(SH, locs_p, attn_p, tile_base)  # (B,H,L,Q*16)
    g_bh = g.reshape(B, Q, H, D).transpose(0, 2, 1, 3).reshape(
        B * H, Q, D)
    g_bh = jnp.pad(g_bh, ((0, 0), (0, Qpad - Q), (0, 0)))

    idx_bh = np.asarray(idx).reshape(B * H, L, Qpad * M.GROUP)
    valn = np.asarray(val)
    gn = np.asarray(g_bh)
    vdot = np.zeros((B * H, L, Qpad * M.GROUP), np.float32)
    for bh in range(B * H):
        for l in range(L):
            for k in range(Qpad * M.GROUP):
                t, lane = divmod(int(idx_bh[bh, l, k]), M.LANE)
                q = k // M.GROUP
                vdot[bh, l, k] = np.dot(valn[bh, t, :, lane], gn[bh, q])

    _, vjp_w = jax.vjp(
        lambda lo, at: M._prep_taps(SH, lo, at, tile_base)[1],
        locs_p, attn_p)
    g_loc_p, g_attn_p = vjp_w(jnp.asarray(vdot).reshape(B, H, L,
                                                        Qpad * M.GROUP))
    gloc_p = g_loc_p[:, :Q]
    gattn_p = g_attn_p[:, :Q]

    for name, a, b in (("gloc", gloc_x, gloc_p), ("gattn", gattn_x,
                                                  gattn_p)):
        err = float(jnp.max(jnp.abs(a - b)))
        mx = float(jnp.max(jnp.abs(a)))
        print(f"{name}: maxerr {err:.3e} vs oracle max {mx:.3e}")


if __name__ == "__main__":
    main()
