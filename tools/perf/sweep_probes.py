"""Sweep STATIC_PROBES / TAIL_PROBES at encoder scale, spread 1px."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench_msda import encoder_shapes, make_inputs, bench
from pavenet_tpu.ops.pallas import msda as M


def main():
    shapes = encoder_shapes(800, 1344)
    value, loc, attn = make_inputs(shapes, B=3, spread=1.0)
    for S, T in [(4, 4), (3, 4), (4, 2), (5, 3)]:
        M.STATIC_PROBES = S
        M.TAIL_PROBES = T
        M.PROBE_PAD = S + T - 1
        call = lambda v, l, a: M.ms_deform_attn_pallas(v, shapes, l, a)
        t0 = time.perf_counter()
        per, val = bench(call, value, loc, attn, 6)
        print(f"S={S} T={T}: {per * 1e3:8.2f} ms/call (chk {val:.6g}, "
              f"wall {time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
