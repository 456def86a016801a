# (reference: configs/fcos/fcos_r101_caffe_fpn_gn-head_4x4_1x_coco.py)
_base_ = './fcos_r50_caffe_fpn_gn-head_4x4_1x_coco.py'
model = dict(
    pretrained='open-mmlab://detectron2/resnet101_caffe',
    backbone=dict(depth=101,
                  norm_cfg=dict(type='BN', requires_grad=False),
                  norm_eval=True, style='caffe'))
