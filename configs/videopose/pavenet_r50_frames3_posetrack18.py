# PAVE-Net R50 T=3 on PoseTrack18 (rebuild of the reference config
# configs/videopose/2025-2-13/2025_2_13_res50_num_frames_3_posetrack18.py —
# identical model, PT18 dataset base)
_base_ = './pavenet_r50_frames3_posetrack17.py'
data = dict(
    train=dict(
        first_frame_index=0,
        ann_file='data/posetrack18/jsons/posetrack_train.json',
        img_prefix='data/posetrack18/images/'),
    val=dict(
        first_frame_index=0,
        ann_file='data/posetrack18/jsons/posetrack_val.json',
        img_prefix='data/posetrack18/images/'),
    test=dict(
        first_frame_index=0,
        ann_file='data/posetrack18/jsons/posetrack_val.json',
        img_prefix='data/posetrack18/images/'))
