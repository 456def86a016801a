# (reference: configs/rpn/rpn_r50_caffe_c4_1x_coco.py)
_base_ = './rpn_r50_fpn_1x_coco.py'

model = dict(
    pretrained='open-mmlab://detectron2/resnet50_caffe',
    backbone=dict(num_stages=3, out_indices=(2,), frozen_stages=1,
                  norm_cfg=dict(type='BN', requires_grad=False),
                  norm_eval=True, style='caffe'),
    neck=None,
    rpn_head=dict(in_channels=1024,
                  anchor_generator=dict(scales=[2, 4, 8, 16, 32],
                                        ratios=[0.5, 1.0, 2.0],
                                        strides=[16])))
