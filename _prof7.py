import time, numpy as np, jax, jax.numpy as jnp
def sync(x): return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])
from pavenet_tpu.ops import ms_deform_attn_xla
shapes = ((100,168),(50,84),(25,42),(13,21))
N = sum(h*w for h,w in shapes); print('N', N)
BT,H,D,L,P = 3,8,32,4,4
rng = np.random.RandomState(0)
v = jax.device_put(rng.randn(BT,N,H,D).astype(np.float32).astype(jnp.bfloat16))
loc = jax.device_put(rng.rand(BT,N,H,L,P,2).astype(np.float32).astype(jnp.bfloat16))
w = jax.device_put(rng.rand(BT,N,H,L,P).astype(np.float32).astype(jnp.bfloat16))
f = jax.jit(lambda a,b,c: ms_deform_attn_xla(a, shapes, b, c)[0,0,0])
t0=time.time(); sync(f(v,loc,w)); print('full-scale msda compile+run ok', time.time()-t0)
t0=time.time(); sync(f(v,loc,w)); print('second call', time.time()-t0)
