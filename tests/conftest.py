"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

The machine environment pins ``JAX_PLATFORMS=axon`` (a tunneled TPU whose
host<->device round trips make eager/test work pathologically slow), so we
must hard-override — not setdefault — before jax initializes its backends.
"""
import os

if os.environ.get("PAVENET_TEST_TPU"):
    # escape hatch: run the TPU-gated kernel parity tests on real hardware
    # (e.g. PAVENET_TEST_TPU=1 pytest tests/test_pallas_msda.py)
    import jax
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
# jax 0.9 CPU convs/matmuls default to a reduced-precision path (~6e-3
# rel error vs f64 numpy; torch is exact) — force full f32 so parity
# tests compare math, not fastmath (TPU bench paths are unaffected)
jax.config.update("jax_default_matmul_precision", "highest")
