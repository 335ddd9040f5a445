import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def sync(x): return float(np.asarray(x).ravel()[0])

# gather along LONG lane axis: val (D, N) idx (D, Q) -> (D, Q)
D, N, Q = 32, 5120, 2048
val = np.random.randn(D, N).astype(np.float32)
idx = np.random.randint(0, N, (D, Q)).astype(np.int32)
idx[1:] = idx[0]  # same index per row (like msda)

def kern(v_ref, i_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(v_ref[:], i_ref[:], axis=1)
try:
    out = pl.pallas_call(kern,
        out_shape=jax.ShapeDtypeStruct((D, Q), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(val, idx)
    err = np.abs(np.asarray(out) - np.take_along_axis(val, idx, 1)).max()
    print('long-lane gather OK, err', err)
    # time it: 20 reps inside scan
    import functools
    f = lambda v, i: pl.pallas_call(kern,
        out_shape=jax.ShapeDtypeStruct((D, Q), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(v, i)
    @jax.jit
    def loop(v, i):
        def body(c, _):
            return c + f(v, i + (c==-1).astype(jnp.int32))[0,0], None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=50)
        return c
    sync(loop(val, idx))
    t0=time.time(); sync(loop(val, idx)); t=time.time()-t0
    print(f'gather (32x2048 from 32x5120): {t/50*1e6:.1f} us/call')
except Exception as e:
    print('long-lane gather FAILED:', str(e)[:250])
