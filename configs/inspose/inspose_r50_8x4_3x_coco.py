# InsPose R-50 COCO (rebuild of the reference config
# configs/inspose/inspose_r50_8x4_3x_coco.py)
_base_ = [
    '../_base_/datasets/coco_keypoint.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='opera.InsPose',
    backbone=dict(
        type='mmdet.ResNet',
        depth=50,
        num_stages=4,
        out_indices=(1, 2, 3),
        frozen_stages=1,
        norm_eval=True),
    bbox_head=dict(
        type='opera.InsPoseHead',
        num_classes=1,
        num_keypoints=17,
        stacked_convs=3,
        feat_channels=256,
        center_sampling=True,
        center_sample_radius=1.5,
        loss_cls=dict(type='mmdet.VarifocalLoss', use_sigmoid=True,
                      loss_weight=1.0),
        loss_hm=dict(type='opera.CenterFocalLoss', loss_weight=1.0)),
    test_cfg=dict(
        nms=dict(type='soft_nms', iou_threshold=0.3),
        max_per_img=100))
optimizer = dict(type='AdamW', lr=1e-4, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=0.1, norm_type=2))
lr_config = dict(policy='step', step=[27, 33])
runner = dict(type='EpochBasedRunner', max_epochs=36)
