# PAVE-Net R50 T=3 on PoseTrack21 — the north-star benchmark dataset.
# PT21 ships PT18-format jsons (0-indexed frames; reference
# configs/_base_/datasets/posetrack21_keypoint.py:86-104 points its PT21
# runs at posetrack18_json_files/*_fixed.json); identical model to the
# PT17/PT18 flagships.
_base_ = './pavenet_r50_frames3_posetrack17.py'
data = dict(
    train=dict(
        first_frame_index=0,
        ann_file='data/posetrack21/posetrack18_json_files/'
                 'posetrack_train_fixed.json',
        img_prefix='data/posetrack21/images/'),
    val=dict(
        first_frame_index=0,
        ann_file='data/posetrack21/posetrack18_json_files/'
                 'posetrack_val_fixed.json',
        img_prefix='data/posetrack21/images/'),
    test=dict(
        first_frame_index=0,
        ann_file='data/posetrack21/posetrack18_json_files/'
                 'posetrack_val_fixed.json',
        img_prefix='data/posetrack21/images/'))
