# (reference: configs/htc/htc_r101_fpn_20e_coco.py)
_base_ = './htc_r50_fpn_1x_coco.py'
model = dict(pretrained='torchvision://resnet101',
             backbone=dict(depth=101))
lr_config = dict(step=[16, 19])
total_epochs = 20
