"""Three-way gloc comparison: pallas-TPU vs xla-TPU vs xla-CPU oracle."""
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
    value = rng.randn(B, N, H, D).astype(np.float32)
    base = rng.rand(B, Q, H, 1, 1, 2)
    loc = (base + rng.randn(B, Q, H, L, P, 2) * 0.02).astype(np.float32)
    attn = rng.rand(B, Q, H, L, P).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)
    g = rng.randn(B, Q, H * D).astype(np.float32)

    def gl(fn, dev):
        args = [jax.device_put(jnp.asarray(x), dev)
                for x in (value, loc, attn, g)]

        @jax.jit
        def run(v, l, a, gg):
            _, vjp = jax.vjp(lambda l_, a_: fn(v, SH, l_, a_), l, a)
            return vjp(gg)

        return [np.asarray(jax.device_get(x)) for x in run(*args)]

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    gx_cpu = gl(ms_deform_attn_xla, cpu)
    gx_tpu = gl(ms_deform_attn_xla, tpu)
    gp_tpu = gl(ms_deform_attn_pallas, tpu)

    for name, ref, a, b in (("gloc", gx_cpu[0], gx_tpu[0], gp_tpu[0]),
                            ("gattn", gx_cpu[1], gx_tpu[1], gp_tpu[1])):
        ex = np.abs(a - ref).max()
        ep = np.abs(b - ref).max()
        print(f"{name}: scale {np.abs(ref).max():.3e}  "
              f"xla-tpu err {ex:.3e}  pallas-tpu err {ep:.3e}")
        if ex > 1e-3:
            i = np.unravel_index(np.abs(a - ref).argmax(), ref.shape)
            print(f"  xla-tpu worst at {i}: tpu {a[i]:.4f} cpu {ref[i]:.4f} "
                  f"loc {loc[i[:-1]] if name == 'gloc' else ''}")
        if ep > 1e-3:
            i = np.unravel_index(np.abs(b - ref).argmax(), ref.shape)
            print(f"  pallas worst at {i}: tpu {b[i]:.4f} cpu {ref[i]:.4f}")


if __name__ == "__main__":
    main()
