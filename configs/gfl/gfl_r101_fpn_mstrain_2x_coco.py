# (reference: configs/gfl/gfl_r101_fpn_mstrain_2x_coco.py)
_base_ = './gfl_r50_fpn_mstrain_2x_coco.py'
model = dict(pretrained='torchvision://resnet101',
             backbone=dict(depth=101))
