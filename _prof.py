import time, numpy as np, jax, jax.numpy as jnp

def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])

def timeit(name, fn, *args, iters=10):
    out = fn(*args); sync(out)
    t0=time.time()
    for _ in range(iters): out = fn(*args)
    sync(out)
    t = (time.time()-t0)/iters*1e3
    print(f'{name}: {t:.2f} ms/iter', flush=True)
    return t

from pavenet_tpu.ops import ms_deform_attn_xla
shapes = ((48,80),(24,40),(12,20),(6,10))
N = sum(h*w for h,w in shapes)
BT, H, D, L, P = 3, 8, 32, 4, 4
rng = np.random.RandomState(0)
dt = jnp.bfloat16
v = jax.device_put(rng.randn(BT,N,H,D).astype(np.float32).astype(dt))
loc = jax.device_put(rng.rand(BT,N,H,L,P,2).astype(np.float32).astype(dt))
w = jax.device_put(rng.rand(BT,N,H,L,P).astype(np.float32).astype(dt))
f = jax.jit(lambda a,b,c: ms_deform_attn_xla(a, shapes, b, c))
timeit('msda encoder-scale (Q=N=%d)'%N, f, v, loc, w)

# matmul of comparable flops for reference: QxHLPx4 taps x D mults
x = jax.device_put(rng.randn(N, 256).astype(np.float32).astype(dt))
W_ = jax.device_put(rng.randn(256, 1024).astype(np.float32).astype(dt))
g = jax.jit(lambda a,b: a@b)
timeit('matmul N x 256 x 1024', g, x, W_)
