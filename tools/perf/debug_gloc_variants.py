"""Pin down when the grad-of-loss program yields wrong gloc on TPU.

V1: each impl's sum(out^2) grad in its OWN jit
V2: both impls' vjp with one FIXED cotangent in ONE jit
V3: both impls' sum(out^2) grads in ONE jit (check_msda.py's shape)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from pavenet_tpu.ops.ms_deform_attn import ms_deform_attn_xla
from pavenet_tpu.ops.pallas.msda import ms_deform_attn_pallas


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

    def loss_of(fn):
        return lambda v, l, a: jnp.sum(fn(v, SH, l, a) ** 2)

    # V1: separate jits
    gp = jax.jit(jax.grad(loss_of(ms_deform_attn_pallas),
                          argnums=(0, 1, 2)))(value, loc, attn)
    gx = jax.jit(jax.grad(loss_of(ms_deform_attn_xla),
                          argnums=(0, 1, 2)))(value, loc, attn)
    gp, gx = jax.device_get((gp, gx))
    print("V1 separate jits: gloc |p|max %.3e |x|max %.3e  diff %.3e"
          % (np.abs(gp[1]).max(), np.abs(gx[1]).max(),
             np.abs(gp[1] - gx[1]).max()))

    # V3: one jit, both grads
    @jax.jit
    def both(v, l, a):
        gp = jax.grad(loss_of(ms_deform_attn_pallas),
                      argnums=(0, 1, 2))(v, l, a)
        gx = jax.grad(loss_of(ms_deform_attn_xla),
                      argnums=(0, 1, 2))(v, l, a)
        return gp, gx

    gp3, gx3 = jax.device_get(both(value, loc, attn))
    print("V3 one jit both: gloc |p|max %.3e |x|max %.3e  diff %.3e"
          % (np.abs(gp3[1]).max(), np.abs(gx3[1]).max(),
             np.abs(gp3[1] - gx3[1]).max()))
    print("V3 vs V1: pallas self-diff %.3e, xla self-diff %.3e"
          % (np.abs(gp3[1] - gp[1]).max(), np.abs(gx3[1] - gx[1]).max()))


if __name__ == "__main__":
    main()
