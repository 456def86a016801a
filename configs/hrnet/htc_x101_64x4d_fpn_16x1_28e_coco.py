# (reference: configs/hrnet/htc_x101_64x4d_fpn_16x1_28e_coco.py)
_base_ = '../htc/htc_r50_fpn_1x_bonai.py'
model = dict(
    pretrained='open-mmlab://resnext101_64x4d',
    backbone=dict(type='ResNeXt', depth=101, groups=64,
                  base_width=4))
lr_config = dict(step=[24, 27])
total_epochs = 28
