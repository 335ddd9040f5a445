# Single-frame PETR R50 on PoseTrack21 (15 keypoints).  Counterpart of the
# reference's single-frame PT21 surface
# (configs/vedpose/single_frame_posetrack21_res50.py — which wires the
# experimental VedPoseHeadV2; this rebuild uses the production PETR head,
# same backbone/neck/transformer scale, same 15-kpt PT21 data plumbing,
# init from a COCO-pretrained 15-kpt checkpoint as the reference does).
_base_ = [
    './petr_r50_16x2_100e_coco.py',
]
model = dict(
    bbox_head=dict(num_keypoints=15))
data = dict(
    train=dict(
        _delete_=True,
        type='opera.PosetrackPoseDataset',
        ann_file='data/posetrack21/posetrack18_json_files/'
                 'posetrack_train_fixed.json',
        img_prefix='data/posetrack21/images/'),
    val=dict(
        _delete_=True,
        type='opera.PosetrackPoseDataset',
        test_mode=True,
        ann_file='data/posetrack21/posetrack18_json_files/'
                 'posetrack_val_fixed.json',
        img_prefix='data/posetrack21/images/'),
    test=dict(
        _delete_=True,
        type='opera.PosetrackPoseDataset',
        test_mode=True,
        ann_file='data/posetrack21/posetrack18_json_files/'
                 'posetrack_val_fixed.json',
        img_prefix='data/posetrack21/images/'))
