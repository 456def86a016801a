# (reference: configs/rpn/rpn_x101_32x4d_fpn_1x_coco.py)
_base_ = './rpn_r50_fpn_1x_coco.py'
model = dict(
    pretrained='open-mmlab://resnext101_32x4d',
    backbone=dict(type='ResNeXt', depth=101, groups=32,
                  base_width=4))
