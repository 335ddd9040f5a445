# SOIT R-101 COCO instance segmentation (reference
# configs/soit/soit_r101_16x2_50e_coco.py; published 42.9 mask / 49.5 box mAP)
#
# The reference initializes the backbone from torchvision://resnet101
# (init_cfg Pretrained); this environment has no egress, so initialize the
# backbone via a torch2flax-converted checkpoint instead — the published
# numbers apply to converted checkpoints, not from-scratch runs.
_base_ = './soit_r50_16x2_50e_coco.py'
model = dict(backbone=dict(depth=101))
