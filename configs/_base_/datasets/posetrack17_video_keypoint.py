# PoseTrack17 3-frame clips (mirrors the reference dataset base config
# configs/_base_/datasets/posetrack17_video_keypoint.py)
dataset_type = 'opera.PosetrackVideoPoseDataset'
data_root = 'data/posetrack17/'
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])

data = dict(
    samples_per_gpu=1,
    workers_per_gpu=1,
    train=dict(
        type=dataset_type,
        num_frames=3,
        ann_file=data_root + 'jsons/posetrack_train_fixed.json',
        img_prefix=data_root + 'images_renamed/'),
    val=dict(
        type=dataset_type,
        num_frames=3,
        test_mode=True,
        ann_file=data_root + 'jsons/posetrack_val_fixed.json',
        img_prefix=data_root + 'images_renamed/'),
    test=dict(
        type=dataset_type,
        num_frames=3,
        test_mode=True,
        ann_file=data_root + 'jsons/posetrack_val_fixed.json',
        img_prefix=data_root + 'images_renamed/'))
evaluation = dict(interval=1, metric='keypoints')
