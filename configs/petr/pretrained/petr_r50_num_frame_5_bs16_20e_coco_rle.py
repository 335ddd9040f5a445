# Stage-2 fake-clip COCO video pretraining (r50, T=5; template for the
# reference configs/petr/pretrained/petr_r50_num_frame_5_bs16_20e_coco_rle.py
# — the reference file references drifted experimental class names,
# SURVEY.md Appendix C; rebuilt on the production video head)
_base_ = [
    '../../_base_/datasets/coco_video_keypoint_num_frames_5.py',
    '../../_base_/default_runtime.py',
]
model = dict(
    type='opera.VideoPoseV1',
    init_cfg=dict(type='Pretrained',
                  checkpoint='checkpoints/petr_r50_16x2_100e_coco.pkl'),
    backbone=dict(
        type='mmdet.ResNet',
        input_type='mul_frames',
        depth=50,
        num_stages=4,
        out_indices=(1, 2, 3),
        frozen_stages=1,
        norm_eval=True),
    neck=dict(
        type='mmdet.ChannelMapper',
        kernel_size=1,
        out_channels=256,
        num_outs=4),
    bbox_head=dict(
        type='opera.VideoPoseHeadMulFrames',
        num_frames=5,
        num_keypoints=17,
        num_query=300,
        num_classes=1,
        sync_cls_avg_factor=True,
        with_kpt_refine=True,
        as_two_stage=True,
        transformer=dict(
            type='opera.VideoPoseTransformerMulFrames',
            num_keypoints=17,
            num_frames=5,
            encoder=dict(
                type='mmcv.DetrTransformerEncoder',
                num_layers=6,
                transformerlayers=dict(
                    attn_cfgs=dict(embed_dims=256),
                    feedforward_channels=1024,
                    ffn_dropout=0.1)),
            decoder=dict(
                type='opera.VideoPoseTransformerDecoderV2',
                num_keypoints=17,
                num_layers=3,
                return_intermediate=True),
            refine_decoder=dict(
                type='mmcv.DeformableDetrTransformerDecoderV1',
                num_layers=2,
                return_intermediate=True)),
        positional_encoding=dict(
            type='mmcv.SinePositionalEncoding',
            num_feats=128, normalize=True, offset=-0.5),
        loss_cls=dict(type='mmdet.FocalLoss', use_sigmoid=True,
                      gamma=2.0, alpha=0.25, loss_weight=2.0),
        loss_kpt=dict(type='opera.RLELoss', loss_weight=0.5),
        loss_kpt_rpn=dict(type='opera.RLELoss', loss_weight=0.5),
        loss_oks=dict(type='opera.OKSLoss', num_keypoints=17,
                      loss_weight=0.0),
        loss_hm=dict(type='opera.CenterFocalLoss', loss_weight=0.0),
        loss_kpt_refine=dict(type='opera.RLELoss', loss_weight=0.5),
        loss_oks_refine=dict(type='opera.OKSLoss', num_keypoints=17,
                             loss_weight=0.0)),
    train_cfg=dict(
        assigner=dict(
            type='opera.PoseHungarianAssigner',
            cls_cost=dict(type='mmdet.FocalLossCost', weight=2.0),
            kpt_cost=dict(type='opera.KptL1Cost', weight=70.0),
            oks_cost=dict(type='opera.OksCost', num_keypoints=17,
                          weight=7.0))),
    test_cfg=dict(max_per_img=100))
optimizer = dict(
    type='AdamW',
    lr=2e-5,
    weight_decay=0.0001,
    paramwise_cfg=dict(
        custom_keys={
            'backbone': dict(lr_mult=0.1),
            'sampling_offsets': dict(lr_mult=0.1),
            'reference_points': dict(lr_mult=0.1),
        }))
optimizer_config = dict(
    type='GradientCumulativeOptimizerHook',
    cumulative_iters=16,
    grad_clip=dict(max_norm=0.1, norm_type=2))
lr_config = dict(policy='step', step=[15])
runner = dict(type='EpochBasedRunner', max_epochs=20)
