import time, numpy as np, jax, jax.numpy as jnp
from pavenet_tpu.models.zoo import pavenet_r50_frames3, dummy_clip_batch
from pavenet_tpu.apis.train import create_train_state, make_train_step

model = pavenet_r50_frames3(dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
batch = dummy_clip_batch(rng, batch_size=1, height=384, width=640, train=True)
batch = jax.device_put(batch)
t0=time.time()
state, tx = create_train_state(model, batch, tx_kwargs=dict(accumulate_steps=8))
print('state init', time.time()-t0, flush=True)
step = make_train_step(model, tx)
t0=time.time()
state, losses = step(state, batch)
print('first step (compile)', time.time()-t0, {k: float(v) for k,v in losses.items()}, flush=True)
N=5
t0=time.time()
for _ in range(N):
    state, losses = step(state, batch)
v = float(losses['loss'])
t=time.time()-t0
print(f'train step: {t/N*1e3:.0f} ms/step at 384x640 bucket (loss {v:.3f})', flush=True)
