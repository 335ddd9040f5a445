# PETR R-101 COCO (reference configs/petr/petr_r101_16x2_100e_coco.py)
_base_ = './petr_r50_16x2_100e_coco.py'
model = dict(backbone=dict(depth=101))
