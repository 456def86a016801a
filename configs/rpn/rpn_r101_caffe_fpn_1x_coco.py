# (reference: configs/rpn/rpn_r101_caffe_fpn_1x_coco.py)
_base_ = './rpn_r50_fpn_1x_coco.py'
model = dict(
    pretrained='open-mmlab://detectron2/resnet101_caffe',
    backbone=dict(depth=101,
                  norm_cfg=dict(type='BN', requires_grad=False),
                  norm_eval=True, style='caffe'))
