# DK-DETR LVIS -> COCO transfer evaluation (rebuild of the reference
# configs/dk-detr/dkd_r50_70e_test_coco.py)
_base_ = 'dkd_r50_70e_lvis.py'

model = dict(
    output_mask=False,
    text_encoder=dict(
        text_feat_path='checkpoints/dk-detr/coco_text_embedding.npy'))

data_root = 'data/coco/'
data = dict(
    train=None,
    val=dict(
        _delete_=True,
        type='opera.CocoDataset',
        test_mode=True,
        ann_file=data_root + 'annotations/instances_val2017.json',
        img_prefix=data_root + 'val2017/'),
    test=dict(
        _delete_=True,
        type='opera.CocoDataset',
        test_mode=True,
        ann_file=data_root + 'annotations/instances_val2017.json',
        img_prefix=data_root + 'val2017/'))

evaluation = dict(metric=['bbox'])
