# SOIT R-101 COCO instance segmentation (reference
# configs/soit/soit_r101_16x2_50e_coco.py; published 42.9 mask / 49.5 box mAP)
_base_ = './soit_r50_16x2_50e_coco.py'
model = dict(backbone=dict(depth=101))
