checkpoint_config = dict(interval=1, max_keep_ckpts=20)
log_config = dict(interval=40)
custom_hooks = []
dist_params = dict()  # multi-host init is jax.distributed.initialize
log_level = 'INFO'
load_from = None
resume_from = None
workflow = [('train', 1)]
