# PAVE-Net Swin-L T=3 on PoseTrack18 (rebuild of the reference config
# configs/videopose/2025-2-13/2025_2_13_swin_num_frames_3_posetrack18.py)
_base_ = './pavenet_r50_frames3_posetrack18.py'
model = dict(
    backbone=dict(
        _delete_=True,
        type='mmdet.SwinTransformer',
        num_frames=3,
        embed_dims=192,
        depths=[2, 2, 18, 2],
        num_heads=[6, 12, 24, 48],
        window_size=7,
        mlp_ratio=4,
        qkv_bias=True,
        drop_path_rate=0.3,
        patch_norm=True,
        out_indices=(1, 2, 3),
        with_cp=False),
    neck=dict(in_channels=[384, 768, 1536]))
