import time, numpy as np, jax, jax.numpy as jnp
from pavenet_tpu.models.zoo import pavenet_r50_frames3, dummy_clip_batch

model = pavenet_r50_frames3(dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
batch = dummy_clip_batch(rng, batch_size=1, height=800, width=1344)
batch = jax.device_put(batch); jax.block_until_ready(batch)
variables = jax.jit(lambda: model.init({'params': jax.random.PRNGKey(0),
    'dropout': jax.random.PRNGKey(1)}, batch, train=False))()
jax.block_until_ready(variables)
print('init ok', flush=True)

def timed(name, fn, iters=6):
    @jax.jit
    def loop(v, b):
        def body(c, _):
            bb = dict(b); bb['img'] = b['img'] + c.astype(b['img'].dtype)
            out = fn(v, bb)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return leaf.ravel()[0].astype(jnp.float32) * 0.0, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c
    t0=time.time(); float(np.asarray(loop(variables, batch))); c=time.time()-t0
    t0=time.time(); float(np.asarray(loop(variables, batch))); t=time.time()-t0
    print(f'{name}: {t/iters*1e3:.1f} ms (compile {c:.0f}s)', flush=True)

# backbone+neck
timed('backbone+neck', lambda v, b: model.apply(
    v, b['img'], method='extract_feats')[0])
# full outputs (encoder+two-stage+decoder)
timed('forward_outputs', lambda v, b: model.apply(
    v, b['img'], b['img_shape'], method='forward_outputs')['all_cls_scores'])
# full test (adds refine + nms)
timed('forward_test', lambda v, b: model.apply(v, b, train=False)['det_kpts'])
