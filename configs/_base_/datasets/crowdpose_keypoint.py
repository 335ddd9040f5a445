# CrowdPose 14-keypoint dataset (mirrors the reference
# configs/_base_/datasets/crowdpose_keypoint.py)
dataset_type = 'opera.CrowdPoseDataset'
data_root = 'data/crowdpose/'
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])

data = dict(
    samples_per_gpu=1,
    workers_per_gpu=1,
    train=dict(
        type=dataset_type,
        ann_file=data_root + 'annotations/crowdpose_trainval.json',
        img_prefix=data_root + 'images/'),
    val=dict(
        type=dataset_type,
        test_mode=True,
        ann_file=data_root + 'annotations/crowdpose_test.json',
        img_prefix=data_root + 'images/'),
    test=dict(
        type=dataset_type,
        test_mode=True,
        ann_file=data_root + 'annotations/crowdpose_test.json',
        img_prefix=data_root + 'images/'))
evaluation = dict(interval=1, metric='keypoints')
