# (reference: configs/fcos/fcos_x101_64x4d_fpn_gn-head_mstrain_640-800_4x2_2x_coco.py)
_base_ = './fcos_r50_caffe_fpn_gn-head_mstrain_640-800_4x4_2x_coco.py'
model = dict(
    pretrained='open-mmlab://resnext101_64x4d',
    backbone=dict(type='ResNeXt', depth=101, groups=64,
                  base_width=4))
