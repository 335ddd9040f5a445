# PETR Swin-L CrowdPose, 14 keypoints (rebuild of the reference config
# configs/petr/petr_swin-l-p4-w7-224-22kto1k_16x1_100e_crowdpose.py)
_base_ = [
    './petr_swin-l-p4-w7-224-22kto1k_16x1_100e_coco.py',
]
model = dict(
    bbox_head=dict(num_keypoints=14))
data = dict(
    train=dict(
        _delete_=True,
        type='opera.CrowdPoseDataset',
        ann_file='data/crowdpose/annotations/crowdpose_trainval.json',
        img_prefix='data/crowdpose/images/'),
    val=dict(
        _delete_=True,
        type='opera.CrowdPoseDataset',
        test_mode=True,
        ann_file='data/crowdpose/annotations/crowdpose_test.json',
        img_prefix='data/crowdpose/images/'),
    test=dict(
        _delete_=True,
        type='opera.CrowdPoseDataset',
        test_mode=True,
        ann_file='data/crowdpose/annotations/crowdpose_test.json',
        img_prefix='data/crowdpose/images/'))
