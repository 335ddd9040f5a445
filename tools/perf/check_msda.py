"""Jitted exactness check of the Pallas msda kernel vs the XLA oracle.

Runs fwd + grads in ONE jitted program per case (pytest's eager-style
asserts are pathologically slow over the axon tunnel). Cases cover the
static-probe window, the top-anchored tail probes (spans 5..8), and the
fori middle tail (global random locations -> spans >> 8).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run_case(shapes, B, Q, H, D, P, mode, seed, impl="msda"):
    from pavenet_tpu.ops.ms_deform_attn import ms_deform_attn_xla
    if impl == "cs":
        from pavenet_tpu.ops.pallas.msda_cs import (
            ms_deform_attn_cs as ms_deform_attn_pallas)
    else:
        from pavenet_tpu.ops.pallas.msda import ms_deform_attn_pallas

    rng = np.random.RandomState(seed)
    N = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = jnp.asarray(rng.randn(B, N, H, D).astype(np.float32))
    if mode == "global":
        loc = rng.rand(B, Q, H, L, P, 2) * 1.4 - 0.2  # incl out-of-range
    else:
        base = rng.rand(B, Q, H, 1, 1, 2)
        loc = base + rng.randn(B, Q, H, L, P, 2) * float(mode)
    loc = jnp.asarray(loc.astype(np.float32))
    attn = rng.rand(B, Q, H, L, P).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)
    attn = jnp.asarray(attn)

    # IMPORTANT: inputs are passed as jit ARGUMENTS.  Closure-capturing them
    # turns them into program constants, and constant folding of the XLA
    # branch then runs with different numerics (observed: bogus ~60x gloc
    # mismatches that vanish the moment inputs become arguments).
    @jax.jit
    def diff(value, loc, attn):
        o_p = ms_deform_attn_pallas(value, shapes, loc, attn)
        o_x = ms_deform_attn_xla(value, shapes, loc, attn)

        def loss_p(v, l, a):
            return jnp.sum(ms_deform_attn_pallas(v, shapes, l, a) ** 2)

        def loss_x(v, l, a):
            return jnp.sum(ms_deform_attn_xla(v, shapes, l, a) ** 2)

        gp = jax.grad(loss_p, argnums=(0, 1, 2))(value, loc, attn)
        gx = jax.grad(loss_x, argnums=(0, 1, 2))(value, loc, attn)
        errs = [jnp.max(jnp.abs(o_p - o_x))]
        scale = [jnp.maximum(jnp.max(jnp.abs(o_x)), 1e-6)]
        for a, b in zip(gp, gx):
            errs.append(jnp.max(jnp.abs(a - b)))
            scale.append(jnp.maximum(jnp.max(jnp.abs(b)), 1e-6))
        return jnp.stack(errs), jnp.stack(scale)

    errs, scale = jax.device_get(diff(value, loc, attn))
    rel = errs / scale
    tags = ["out", "gval", "gloc", "gattn"]
    worst = max(rel)
    line = " ".join(f"{t}={e:.2e}/{r:.2e}" for t, e, r in zip(tags, errs, rel))
    status = "OK " if worst < 5e-5 else "FAIL"
    print(f"{status} {mode:>6} shapes={shapes} B{B} Q{Q} H{H} D{D} P{P}: "
          f"{line}")
    return worst < 5e-5


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="msda", choices=["msda", "cs"])
    args = ap.parse_args()
    cases = [
        # small spans: static window only
        (((24, 32), (12, 16)), 2, 64, 4, 32, 4, "0.02", 0),
        # medium spans: exercise the top-anchored tail probes
        (((40, 52), (20, 26)), 1, 96, 2, 32, 4, "0.08", 1),
        # long spans: fori middle tail
        (((40, 52), (20, 26)), 1, 77, 2, 32, 4, "global", 2),
        # wide level (tile span dominated by row stride)
        (((16, 200),), 1, 64, 2, 32, 4, "0.05", 3),
    ]
    ok = True
    for c in cases:
        ok &= run_case(*c, impl=args.impl)
    print("ALL OK" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
