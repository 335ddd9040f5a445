# Synthetic-overfit gate config (tests/test_overfit.py): the tiny debug
# model with every stochastic augmentation disabled and an aggressive
# schedule, so the full CLI loop (train -> checkpoint -> test -> eval)
# can memorize a handful of fixed clips.  Proves the optimizer/assigner/
# eval composition can actually fit data (round-3 VERDICT item 6), not
# just emit finite losses.
_base_ = ['pavenet_tiny_debug.py']
optimizer = dict(lr=2e-4)
optimizer_config = dict(cumulative_iters=1)
lr_config = dict(policy='step', step=[1000], warmup=None)
runner = dict(max_epochs=1000)  # step-capped by --max-steps
checkpoint_config = dict(max_keep_ckpts=1, interval=1000)
# deterministic pipeline: no photometric, no affine, no flip, one scale
# equal to the test pipeline's img_scale so train and eval see the same
# pixels
train_pipeline_kwargs = dict(
    photometric=False,
    max_rotate_degree=0.0,
    flip_ratio=0.0,
    scale_range=((160, 96), (160, 96)),
    buckets=((192, 256),))
