# Tiny SOIT debug config for CPU smoke tests (detection/instance-seg
# counterpart of configs/videopose/pavenet_tiny_debug.py)
_base_ = ['soit_r50_16x2_50e_coco.py']
model = dict(
    backbone=dict(depth=18),
    neck=dict(in_channels=[128, 256, 512], out_channels=32),
    bbox_head=dict(
        num_query=12,
        num_classes=5,
        max_gt=4,
        transformer=dict(
            encoder=dict(
                num_layers=1,
                transformerlayers=dict(attn_cfgs=dict(embed_dims=32),
                                       feedforward_channels=64)),
            decoder=dict(num_layers=2))),
    test_cfg=dict(max_per_img=6, score_thr=0.0))
runner = dict(max_epochs=1)
test_pipeline_kwargs = dict(
    img_scale=(96, 64),
    buckets=((96, 128),))
