# Fake-clip COCO keypoints: each image replicated into a 5-frame clip
# for stage-2 video pretraining (mirrors the reference
# configs/_base_/datasets/coco_video_keypoint_num_frames_5.py)
dataset_type = 'opera.CocoVideoPoseDataset'
data_root = 'data/coco/'
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])

data = dict(
    samples_per_gpu=1,
    workers_per_gpu=2,
    train=dict(
        type=dataset_type,
        num_frames=5,
        ann_file=data_root + 'annotations/person_keypoints_train2017.json',
        img_prefix=data_root + 'train2017/'),
    val=dict(
        type=dataset_type,
        num_frames=5,
        test_mode=True,
        ann_file=data_root + 'annotations/person_keypoints_val2017.json',
        img_prefix=data_root + 'val2017/'),
    test=dict(
        type=dataset_type,
        num_frames=5,
        test_mode=True,
        ann_file=data_root + 'annotations/person_keypoints_val2017.json',
        img_prefix=data_root + 'val2017/'))
evaluation = dict(interval=1, metric='keypoints')
