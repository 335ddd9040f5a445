"""Does Mosaic compile take_along_axis on a bf16 (D,128) tile? (It did not
on earlier jax versions — value tables are f32 for that reason.)"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(idx_ref, val_ref, out_ref):
    tile = val_ref[...]                      # (D, 128) bf16
    lane = jnp.broadcast_to(idx_ref[...], tile.shape)
    # Mosaic requires gather index bitwidth == data bitwidth
    g = jnp.take_along_axis(tile, lane.astype(jnp.int16), axis=1)
    out_ref[...] = g.astype(jnp.float32)


def main():
    D = 32
    rng = np.random.RandomState(0)
    val = jnp.asarray(rng.randn(D, 128).astype(np.float32)).astype(
        jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, 128, (1, 128)).astype(np.int32))
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, 128), jnp.float32),
    )(idx, val)
    want = np.asarray(val.astype(jnp.float32))[
        np.arange(D)[:, None], np.asarray(idx)[0][None, :].repeat(D, 0)]
    got = np.asarray(jax.jit(lambda: out)())
    err = np.abs(got - want).max()
    print(f"bf16 lane lookup: maxerr {err:.3e} -> "
          f"{'COMPILES+EXACT' if err == 0 else 'MISMATCH'}")


if __name__ == "__main__":
    main()
