# DK-DETR R-50 LVIS v1 open-vocabulary instance segmentation (rebuild of
# the reference config configs/dk-detr/dkd_r50_70e_lvis.py)
_base_ = [
    '../_base_/datasets/lvis_v1_instance.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='opera.DKDETR',
    backbone=dict(
        type='mmdet.ResNet',
        depth=50,
        num_stages=4,
        out_indices=(1, 2, 3),
        frozen_stages=1,
        # reference: SyncBN requires_grad=True, norm_eval=False — the BN
        # trains; stat sync across chips falls out of the pjit batch axis
        norm_eval=False),
    neck=dict(
        type='mmdet.ChannelMapper',
        in_channels=[512, 1024, 2048],
        kernel_size=1,
        out_channels=256,
        num_outs=4),
    bbox_head=dict(
        type='opera.DKDETRHead',
        num_query=300,
        num_classes=1203,
        in_channels=2048,
        sync_cls_avg_factor=True,
        dynamic_params_dims=441,
        dynamic_encoder_heads=4,
        mask_positional_encoding_cfg=dict(
            type='opera.RelSinePositionalEncoding',
            num_feats=4, normalize=True),
        dice_mask_loss_weight=8.0,
        bce_mask_loss_weight=2.0,
        transformer=dict(
            type='opera.SOITTransformer',
            mask_channels=8,
            encoder=dict(
                type='mmcv.DetrTransformerEncoder',
                num_layers=6,
                transformerlayers=dict(
                    attn_cfgs=dict(embed_dims=256),
                    feedforward_channels=1024,
                    ffn_dropout=0.1)),
            decoder=dict(
                type='mmcv.DeformableDetrTransformerDecoder',
                num_layers=6,
                return_intermediate=True)),
        positional_encoding=dict(
            type='mmcv.SinePositionalEncoding',
            num_feats=128, normalize=True, offset=-0.5),
        loss_cls=dict(type='mmdet.FocalLoss', use_sigmoid=True,
                      gamma=2.0, alpha=0.25, loss_weight=2.0),
        loss_bbox=dict(type='mmdet.L1Loss', loss_weight=5.0),
        loss_iou=dict(type='mmdet.GIoULoss', loss_weight=2.0)),
    text_encoder=dict(
        type='PseudoTextEncoder',
        text_dim=512,
        text_feat_path='checkpoints/dk-detr/lvis_text_embedding.npy'),
    temperature=0.05,
    train_cfg=dict(
        assigner=dict(
            type='mmdet.HungarianAssigner',
            cls_cost=dict(type='mmdet.FocalLossCost', weight=2.0),
            reg_cost=dict(type='mmdet.BBoxL1Cost', weight=5.0,
                          box_format='xywh'),
            iou_cost=dict(type='mmdet.IoUCost', iou_mode='giou',
                          weight=2.0))),
    test_cfg=dict(max_per_img=300))
optimizer = dict(
    type='AdamW',
    lr=8e-4,
    weight_decay=0.05,
    paramwise_cfg=dict(
        custom_keys={
            'backbone': dict(lr_mult=0.1),
            'sampling_offsets': dict(lr_mult=0.1),
            'reference_points': dict(lr_mult=0.1)},
        norm_decay_mult=0.,
        bypass_duplicate=True))
optimizer_config = dict(grad_clip=dict(max_norm=0.1, norm_type=2))
lr_config = dict(
    policy='step',
    warmup='linear',
    warmup_iters=2000,
    warmup_ratio=0.001,
    step=[55])
runner = dict(type='EpochBasedRunner', max_epochs=70)
