"""Minimal pure-XLA repro of the attn-stream prep miscompile (v5e).

This is the bug behind the round-2 "cs-native backward quarantine"
(PERF_NOTES "corner-stream").  No Pallas involved: build the kernel's
native-layout attention stream (``_prep_streams``' stack -> reshape of
the per-level attn slices) in the same jit as the ``_stream_weights``
vjp (which consumes the same attn array), and the stream comes out
WRONG — maxdiff ~0.2 on fuzzed softmax weights — while computed alone it
is exact.  All other streams (base/dx/dy, tile windows) stay bitwise
correct; only the array that the coexisting vjp also consumes corrupts.

Observed effect in the kernel program: grad_value (the only output that
uses the attn stream in-kernel) corrupted at the coarse levels' tiles,
while vdot (attn-independent) and g_loc/g_attn (weighted on the XLA side
from the *correct* attn) stayed exact — which originally misattributed
the bug to the kernel's dynamic RMW scatter.

Fix shipped in ``msda_cs._prep_streams``: ``jax.lax.optimization_barrier``
on (locations, weights) isolates the prep's producer fusion from the vjp
consumers; with it, the native backward matches the AD oracle to ~4e-7.

Run on TPU: python tools/perf/debug_xla_prep_miscompile.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from pavenet_tpu.ops.pallas.msda import _tile_bases, _pad_queries
from pavenet_tpu.ops.pallas.msda_cs import (_prep_streams, _stream_weights,
                                            LANE, P_POINTS)


def main():
    rng = np.random.RandomState(0)
    SH = ((24, 32), (12, 16), (6, 8))
    B, Q, H, P = 1, 800, 2, 4
    L = len(SH)
    loc = jnp.asarray(rng.rand(B, Q, H, L, P, 2).astype(np.float32))
    attn = rng.rand(B, Q, H, L, P).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)
    attn = jnp.asarray(attn)
    tile_base, _ = _tile_bases(SH)

    @jax.jit
    def at_alone(lo, at_):
        locs_p, attn_p, _ = _pad_queries(lo, at_)
        return _prep_streams(SH, locs_p, attn_p, tile_base)[3]

    @jax.jit
    def at_with_vjp(lo, at_, seed):
        locs_p, attn_p, Qpad = _pad_queries(lo, at_)
        at_stream = _prep_streams(SH, locs_p, attn_p, tile_base)[3]

        def wfun(l_, a_):
            ws, _ = _stream_weights(SH, l_, a_)
            return tuple(w for lws in ws for w in lws)

        _, vjp_w = jax.vjp(wfun, locs_p, attn_p)
        cts = tuple(jnp.full((B, Qpad, H, P), seed, jnp.float32)
                    for _ in range(L * 4))
        gl, ga = vjp_w(cts)
        return at_stream, jnp.sum(gl ** 2) + jnp.sum(ga ** 2)

    clean = np.asarray(at_alone(loc, attn))
    prog, _ = at_with_vjp(loc, attn, 0.5)
    prog = np.asarray(prog)
    diff = np.abs(prog - clean).max()
    status = "REPRODUCED (XLA fusion bug live)" if diff > 1e-6 else \
        "not reproduced (compiler fixed? barrier still harmless)"
    print(f"attn stream maxdiff alone-vs-with-vjp: {diff:.6f} -> {status}")
    # NOTE: with the optimization_barrier now inside _prep_streams this
    # prints ~0; to see the raw bug, temporarily remove that barrier.


if __name__ == "__main__":
    main()
