"""Isolate the pallas_call operand-streaming cost of the msda kernel.

`msda_ablate.py --abl preponly` (empty kernel body) measured ~43.6 ms at
encoder scale while the XLA prep pieces sum to ~22 ms and CB=128 (4x fewer
grid steps) barely moved it — so the cost is in *streaming the operands*,
not per-step fixed overhead.  This probe times empty-body pallas_calls
with operands added one at a time.

Run: python tools/perf/launch_probe.py [--iters 11]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

LANE = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=11)
    args = ap.parse_args()

    # encoder-scale dimensions (800x1344, B=3, H=8, D=32)
    BH, L, NC, CB, QPC, D = 24, 4, 2816, 32, 8, 32
    NCB = NC // CB
    Tp = 185

    idx = jnp.zeros((BH, L, NCB, CB, 1, LANE), jnp.int32)
    w = jnp.zeros((BH, L, NCB, CB, 1, LANE), jnp.float32)
    val = jnp.zeros((BH, Tp, D, LANE), jnp.float32)
    tmin = jnp.zeros((BH, L, NCB, CB), jnp.int32)

    smem_spec = pl.BlockSpec((1, L, NCB, CB), lambda bh, c, l: (bh, 0, 0, 0),
                             memory_space=pltpu.SMEM)
    tap_spec = pl.BlockSpec((1, 1, 1, CB, 1, LANE),
                            lambda bh, c, l: (bh, l, c, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    val_spec = pl.BlockSpec((1, Tp, D, LANE), lambda bh, c, l: (bh, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, QPC * CB, D), lambda bh, c, l: (bh, c, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((BH, NC * QPC, D), jnp.float32)

    def empty_kernel(*refs):
        out_ref = refs[-1]

        @pl.when(pl.program_id(2) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

    variants = {
        "out_only": ([], []),
        "val": ([val_spec], [val]),
        "val+idx": ([val_spec, tap_spec], [val, idx]),
        "val+idx+w": ([val_spec, tap_spec, tap_spec], [val, idx, w]),
        "all+smem": ([smem_spec, smem_spec, tap_spec, tap_spec, val_spec],
                     [tmin, tmin, idx, w, val]),
    }

    for name, (specs, ops) in variants.items():
        call = pl.pallas_call(
            empty_kernel, grid=(BH, NCB, L), in_specs=specs,
            out_specs=out_spec, out_shape=out_shape)

        def loop(*xs):
            def body(c, _):
                shifted = [x if x.dtype == jnp.int32 else x + c * 0.0
                           for x in xs]
                o = call(*shifted)
                return o.reshape(-1)[0], None
            c, _ = jax.lax.scan(body, jnp.float32(0), None,
                                length=args.iters)
            return c
        f = jax.jit(loop)
        float(np.asarray(f(*ops)))
        t0 = time.perf_counter()
        float(np.asarray(f(*ops)))
        per = (time.perf_counter() - t0) / args.iters
        print(f"{name:12s} {per * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
