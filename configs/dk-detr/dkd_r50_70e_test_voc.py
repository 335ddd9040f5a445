# DK-DETR LVIS -> Pascal VOC transfer evaluation (rebuild of the
# reference configs/dk-detr/dkd_r50_70e_test_voc.py)
_base_ = 'dkd_r50_70e_lvis.py'

model = dict(
    output_mask=False,
    text_encoder=dict(
        text_feat_path='checkpoints/dk-detr/voc_text_embedding.npy'))

data_root = 'data/VOCdevkit/'
data = dict(
    train=None,
    val=dict(
        _delete_=True,
        type='opera.VOCDataset',
        test_mode=True,
        ann_file=data_root + 'VOC2007/ImageSets/Main/test.txt',
        img_prefix=data_root + 'VOC2007/'),
    test=dict(
        _delete_=True,
        type='opera.VOCDataset',
        test_mode=True,
        ann_file=data_root + 'VOC2007/ImageSets/Main/test.txt',
        img_prefix=data_root + 'VOC2007/'))

evaluation = dict(metric=['mAP'], iou_thr=[0.5, 0.75])
