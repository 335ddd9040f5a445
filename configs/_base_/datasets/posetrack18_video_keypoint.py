# PoseTrack18 3-frame clips (mirrors the reference dataset base config
# configs/_base_/datasets/posetrack18_video_keypoint.py; PT18 is 0-indexed,
# handled by the dataset's indexing flag)
dataset_type = 'opera.PosetrackVideoPoseDataset'
data_root = 'data/posetrack18/'
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])

data = dict(
    samples_per_gpu=1,
    workers_per_gpu=1,
    train=dict(
        type=dataset_type,
        num_frames=3,
        first_frame_index=0,
        ann_file=data_root + 'jsons/posetrack_train.json',
        img_prefix=data_root + 'images/'),
    val=dict(
        type=dataset_type,
        num_frames=3,
        first_frame_index=0,
        test_mode=True,
        ann_file=data_root + 'jsons/posetrack_val.json',
        img_prefix=data_root + 'images/'),
    test=dict(
        type=dataset_type,
        num_frames=3,
        first_frame_index=0,
        test_mode=True,
        ann_file=data_root + 'jsons/posetrack_val.json',
        img_prefix=data_root + 'images/'))
evaluation = dict(interval=1, metric='keypoints')
