# LVIS v1 federated instance dataset (mirrors the reference
# configs/_base_/datasets/lvis_v1_instance.py; reference uses
# mmdet.LVISV1Dataset wrapped in mmdet.ClassBalancedDataset)
_base_ = 'coco_instance.py'
dataset_type = 'opera.LVISV1Dataset'
data_root = 'data/coco/images/'
ann_root = 'data/lvis/'

data = dict(
    samples_per_gpu=1,
    workers_per_gpu=1,
    train=dict(
        _delete_=True,
        type='opera.ClassBalancedDataset',
        oversample_thr=1e-3,
        dataset=dict(
            type=dataset_type,
            ann_file=ann_root + 'lvis_v1_train.json',
            img_prefix=data_root)),
    val=dict(
        type=dataset_type,
        test_mode=True,
        ann_file=ann_root + 'lvis_v1_val.json',
        img_prefix=data_root),
    test=dict(
        type=dataset_type,
        test_mode=True,
        ann_file=ann_root + 'lvis_v1_val.json',
        img_prefix=data_root))
evaluation = dict(interval=1, metric=['bbox'])
