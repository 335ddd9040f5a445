# PoseTrack21 3-frame clips.  PoseTrack21 ships PT18-format COCO jsons
# (0-indexed frames); the reference points its PT21 runs at
# `posetrack18_json_files/*_fixed.json` under the PT21 root
# (reference configs/_base_/datasets/posetrack21_keypoint.py:86-104).
dataset_type = 'opera.PosetrackVideoPoseDataset'
data_root = 'data/posetrack21/'
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])

data = dict(
    samples_per_gpu=1,
    workers_per_gpu=1,
    train=dict(
        type=dataset_type,
        num_frames=3,
        first_frame_index=0,
        ann_file=data_root + 'posetrack18_json_files/posetrack_train_fixed.json',
        img_prefix=data_root + 'images/'),
    val=dict(
        type=dataset_type,
        num_frames=3,
        first_frame_index=0,
        test_mode=True,
        ann_file=data_root + 'posetrack18_json_files/posetrack_val_fixed.json',
        img_prefix=data_root + 'images/'),
    test=dict(
        type=dataset_type,
        num_frames=3,
        first_frame_index=0,
        test_mode=True,
        ann_file=data_root + 'posetrack18_json_files/posetrack_val_fixed.json',
        img_prefix=data_root + 'images/'))
evaluation = dict(interval=1, metric='keypoints')
