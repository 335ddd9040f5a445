# PETR HRNet-W48 COCO keypoints (rebuild of the reference config
# configs/petr/petr_hrnetw48_16x2_100e_coco.py)
_base_ = ['petr_r50_16x2_100e_coco.py']
model = dict(
    backbone=dict(
        _delete_=True,
        type='HRNet',
        in_channels=3,
        extra=dict(
            stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                        num_blocks=(4,), num_channels=(64,)),
            stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                        num_blocks=(4, 4), num_channels=(48, 96)),
            stage3=dict(num_modules=4, num_branches=3, block='BASIC',
                        num_blocks=(4, 4, 4), num_channels=(48, 96, 192)),
            stage4=dict(num_modules=3, num_branches=4, block='BASIC',
                        num_blocks=(4, 4, 4, 4),
                        num_channels=(48, 96, 192, 384)))),
    neck=dict(in_channels=[96, 192, 384]))
