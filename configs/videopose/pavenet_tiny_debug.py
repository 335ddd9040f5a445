# Tiny debug config for smoke tests (CPU-friendly sizes)
_base_ = ['pavenet_r50_frames3_posetrack17.py']
model = dict(
    backbone=dict(depth=18),
    bbox_head=dict(
        num_query=20,
        transformer=dict(
            encoder=dict(
                num_layers=1,
                transformerlayers=dict(attn_cfgs=dict(embed_dims=64))),
            decoder=dict(num_layers=2),
            refine_decoder=dict(num_layers=1))),
    test_cfg=dict(max_per_img=5))
optimizer_config = dict(cumulative_iters=2)
runner = dict(max_epochs=1)
max_gt = 10
# small host-pipeline scales for CPU smoke runs
train_pipeline_kwargs = dict(
    scale_range=((96, 160), (160, 160)),
    buckets=((192, 256),))
test_pipeline_kwargs = dict(
    img_scale=(160, 96),
    buckets=((192, 256),))
