# PAVE-Net R50 T=5 on PoseTrack17 (the reference 5-frame lineage:
# opera/datasets/posetrack_video_pose_num_frames_5.py + NumFrames5
# attention/head variants, e.g.
# configs/petr/petr_r50_num_frame_5_bs16_20e_coco_rle_12_18_v1.py; the
# TPU rebuild parameterizes T instead of forking classes)
_base_ = './pavenet_r50_frames3_posetrack17.py'
model = dict(
    bbox_head=dict(
        num_frames=5,
        transformer=dict(num_frames=5)))
data = dict(
    train=dict(num_frames=5),
    val=dict(num_frames=5),
    test=dict(num_frames=5))
