"""Compare the bwd kernel's raw vdot output (TPU) against a CPU emulation."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

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

    tile_base, T_total = M._tile_bases(SH)
    CB, LANE, GROUP, QPC = M.CB, M.LANE, M.GROUP, M.QPC

    @jax.jit
    def kernel_vdot():
        val = M._value_tables(value, SH, T_total)
        valp = jnp.pad(val, ((0, 0), (0, M.PROBE_PAD), (0, 0), (0, 0)))
        Tp = T_total + M.PROBE_PAD
        locs_p, attn_p, Qpad = M._pad_queries(loc, attn)
        NC = Qpad * GROUP // LANE
        idx, w = M._prep_taps(SH, locs_p, attn_p, tile_base)
        idx = idx.reshape(B * H, L, NC // CB, CB, 1, LANE)
        w = w.reshape(B * H, L, NC // CB, CB, 1, LANE)
        tmin, tmax = M._tile_windows(idx)
        g_bh = g.reshape(B, Q, H, D).transpose(0, 2, 1, 3).reshape(
            B * H, Q, D).astype(jnp.float32)
        g_bh = jnp.pad(g_bh, ((0, 0), (0, Qpad - Q), (0, 0)))
        vdot, gval = pl.pallas_call(
            M._msda_bwd_kernel,
            grid=(B * H, NC // CB, L),
            in_specs=[
                pl.BlockSpec((1, L, NC // CB, CB),
                             lambda bh, c, l: (bh, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, L, NC // CB, CB),
                             lambda bh, c, l: (bh, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, CB, 1, LANE),
                             lambda bh, c, l: (bh, l, c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, CB, 1, LANE),
                             lambda bh, c, l: (bh, l, c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Tp, D, LANE),
                             lambda bh, c, l: (bh, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, QPC * CB, D),
                             lambda bh, c, l: (bh, c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, 1, CB, 1, LANE),
                             lambda bh, c, l: (bh, l, c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Tp, D, LANE),
                             lambda bh, c, l: (bh, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B * H, L, NC // CB, CB, 1, LANE),
                                     jnp.float32),
                jax.ShapeDtypeStruct((B * H, Tp, D, LANE), jnp.float32),
            ),
        )(tmin, tmax, idx, w, valp, g_bh)
        return vdot.reshape(B * H, L, Qpad * GROUP), idx, val

    vdot_k, idx, val = jax.device_get(kernel_vdot())

    # CPU emulation
    Qpad = vdot_k.shape[-1] // GROUP
    idx_bh = np.asarray(idx).reshape(B * H, L, Qpad * GROUP)
    valn = np.asarray(val)
    gp = np.asarray(jnp.pad(
        g.reshape(B, Q, H, D).transpose(0, 2, 1, 3).reshape(B * H, Q, D),
        ((0, 0), (0, Qpad - Q), (0, 0))))
    vdot_c = np.zeros_like(vdot_k)
    for bh in range(B * H):
        for l in range(L):
            for k in range(Qpad * GROUP):
                t, lane = divmod(int(idx_bh[bh, l, k]), LANE)
                vdot_c[bh, l, k] = np.dot(valn[bh, t, :, lane],
                                          gp[bh, k // GROUP])

    err = np.abs(vdot_k - vdot_c)
    print(f"vdot maxerr {err.max():.3e} at {np.unravel_index(err.argmax(), err.shape)}"
          f"  scale {np.abs(vdot_c).max():.3e}")
    bad = np.argwhere(err > 1e-3)
    print(f"bad count {len(bad)} / {err.size}")
    for b in bad[:10]:
        bh, l, k = b
        t, lane = divmod(int(idx_bh[bh, l, k]), LANE)
        print(f"  bh{bh} l{l} k{k} (q {k // GROUP}, tap {k % GROUP}) "
              f"tile {t} lane {lane}: kernel {vdot_k[tuple(b)]:.4f} "
              f"cpu {vdot_c[tuple(b)]:.4f}")


if __name__ == "__main__":
    main()
