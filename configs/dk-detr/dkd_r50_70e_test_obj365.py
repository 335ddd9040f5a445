# DK-DETR LVIS -> Objects365 transfer evaluation (rebuild of the
# reference configs/dk-detr/dkd_r50_70e_test_obj365.py)
_base_ = 'dkd_r50_70e_lvis.py'

model = dict(
    output_mask=False,
    text_encoder=dict(
        text_feat_path='checkpoints/dk-detr/obj365_text_embedding.npy'))

data_root = 'data/objects365/'
data = dict(
    train=None,
    val=dict(
        _delete_=True,
        type='opera.Objects365Dataset',
        test_mode=True,
        ann_file=data_root + 'zhiyuan_objv2_val.json',
        img_prefix=data_root + 'images/val/'),
    test=dict(
        _delete_=True,
        type='opera.Objects365Dataset',
        test_mode=True,
        ann_file=data_root + 'zhiyuan_objv2_val.json',
        img_prefix=data_root + 'images/val/'))

evaluation = dict(metric=['bbox'])
