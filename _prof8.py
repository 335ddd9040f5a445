import time, numpy as np, jax, jax.numpy as jnp
def sync(x): return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])
shapes = ((100,168),(50,84),(25,42),(13,21))
N = sum(h*w for h,w in shapes)
BT,H,D,L,P,Q = 3,8,32,4,4,22323
BH = BT*H
rng = np.random.RandomState(0)
v_bh = jax.device_put(rng.randn(BH,N,D).astype(np.float32).astype(jnp.bfloat16))
idx = jax.device_put(rng.randint(0, N, (BH, Q*P)).astype(np.int32))

def gather_vmap(v, i):
    return jax.vmap(lambda a, b: a[b])(v, i)
def gather_flat(v, i):
    vf = v.reshape(BH*N, D)
    off = (jnp.arange(BH, dtype=jnp.int32)*N)[:, None]
    return vf[(i + off).reshape(-1)].reshape(BH, Q*P, D)

for name, fn in [('vmap', gather_vmap), ('flat', gather_flat)]:
    f = jax.jit(lambda v, i, fn=fn: fn(v, i)[0,0,0])
    t0=time.time(); sync(f(v_bh, idx)); c=time.time()-t0
    # chain 10 inside jit
    @jax.jit
    def loop(v, i):
        def body(c, _):
            o = fn(v, (i + c.astype(jnp.int32)) % N)
            return o[0,0,0].astype(jnp.float32)*0, None
        c,_ = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return c
    t0=time.time(); sync(loop(v_bh, idx)); c2=time.time()-t0
    t0=time.time(); sync(loop(v_bh, idx)); t=time.time()-t0
    print(f'{name}: single-gather x10 chained: {t/10*1e3:.2f} ms/gather (compiles {c:.0f}s/{c2:.0f}s)', flush=True)
