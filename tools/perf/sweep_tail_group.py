"""Round-4 parity-kernel ablation (a): tail-branch granularity.

The two-level exact tail redoes TAIL_PROBES probes for every chunk in a
TAIL_GROUP whenever ONE chunk of the group overflows STATIC_PROBES
(msda_cs.py kernel tails; reference semantics unchanged,
ms_deform_attn_cuda_kernel.cuh:238-244).  At block level
(TAIL_GROUP == CB == 8 chunks of 32 queries) a single overflowing chunk
redoes all 256 queries of the step.  This sweeps TAIL_GROUP in
{1, 2, 4, 8} on the production bf16 packed corner-stream kernel at
encoder scale, 1px and 4px spreads.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_msda import encoder_shapes, make_inputs, bench
from pavenet_tpu.ops.pallas import msda_cs as CS


def main():
    shapes = encoder_shapes(800, 1344)
    for spread in (1.0, 4.0):
        value, loc, attn = make_inputs(shapes, B=3, spread=spread)
        value = value.astype(jnp.bfloat16)
        ref = None
        for tg in (8, 4, 2, 1):
            CS.TAIL_GROUP = tg
            call = lambda v, l, a: CS.ms_deform_attn_cs(v, shapes, l, a)
            t0 = time.perf_counter()
            per, val = bench(call, value, loc, attn, 6)
            if ref is None:
                ref = val
            exact = "exact" if val == ref else f"MISMATCH {val} vs {ref}"
            print(f"spread={spread} TAIL_GROUP={tg}: {per * 1e3:8.2f} "
                  f"ms/call ({exact}, wall {time.perf_counter() - t0:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
