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
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=True),
    neck=dict(
        type='mmdet.FPN',
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        start_level=1,
        add_extra_convs='on_output',
        num_outs=5,
        relu_before_extra_convs=True),
    bbox_head=dict(
        type='opera.InsPoseHead',
        num_classes=1,
        num_keypoints=17,
        in_channels=256,
        stacked_convs=4,
        feat_channels=256,
        stacked_convs_kpt=4,
        feat_channels_kpt=512,
        stacked_convs_hm=3,
        feat_channels_hm=512,
        strides=[8, 16, 32, 64, 128],
        center_sampling=True,
        center_sample_radius=1.5,
        centerness_on_reg=True,
        regression_normalize=True,
        with_hm_loss=True,
        loss_cls=dict(type='mmdet.VarifocalLoss', use_sigmoid=True,
                      gamma=2.0, alpha=0.75, iou_weighted=True,
                      loss_weight=1.0),
        loss_bbox=dict(type='mmdet.GIoULoss', loss_weight=1.0),
        loss_hm=dict(type='opera.CenterFocalLoss', loss_weight=1.0)),
    test_cfg=dict(
        nms_pre=1000,
        score_thr=0.05,
        nms=dict(type='soft_nms', iou_threshold=0.3),
        mask_thresh=0.5,
        max_per_img=100))
optimizer = dict(type='AdamW', lr=1e-4, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=0.1, norm_type=2))
lr_config = dict(policy='step', step=[27, 33])
runner = dict(type='EpochBasedRunner', max_epochs=36)
