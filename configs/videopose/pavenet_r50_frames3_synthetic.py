# Synthetic-scenes training config: the flagship PAVE-Net architecture
# on the generated stick-figure PoseTrack distribution
# (pavenet_tpu/datasets/synthetic.py).  Backs the windowed-encoder
# accuracy measurement (tools/distill.py; PERF_NOTES "windowed
# encoder"): train the parity teacher here, distill the windowed
# student, compare held-out AP.  No reference counterpart (the
# reference trains on real PoseTrack; unavailable in this environment).
#
# Generate the data first:
#   python -m pavenet_tpu.datasets.synthetic --root data/synthetic_posetrack
_base_ = ['pavenet_r50_frames3_posetrack17.py']
data_root = 'data/synthetic_posetrack/'
data = dict(
    train=dict(ann_file=data_root + 'train.json', img_prefix=data_root),
    val=dict(ann_file=data_root + 'val.json', img_prefix=data_root),
    test=dict(ann_file=data_root + 'val.json', img_prefix=data_root))
# from-scratch single-chip recipe: no accumulation, higher lr, short
# warmup; one scale + one bucket = one XLA program (the multi-scale
# production pipeline would compile per bucket)
optimizer = dict(lr=1e-4)
optimizer_config = dict(cumulative_iters=1)
lr_config = dict(policy='step', step=[2], warmup='linear',
                 warmup_iters=200, warmup_ratio=0.001)
# 3 epochs x 600 clips is enough on this easy distribution (loss is
# near-flat by epoch 2); the 1-vCPU host makes each epoch ~18 min
# wall (host augs dominate device 0.64 s/step), so the recipe is kept
# short deliberately
runner = dict(max_epochs=3)
checkpoint_config = dict(interval=1, max_keep_ckpts=1)
evaluation = dict(interval=3, metric='keypoints')
train_pipeline_kwargs = dict(
    max_rotate_degree=10.0,
    scale_range=((800, 1333), (800, 1333)),
    buckets=((800, 1344),))
test_pipeline_kwargs = dict(
    img_scale=(1333, 800),
    buckets=((800, 1344),))
