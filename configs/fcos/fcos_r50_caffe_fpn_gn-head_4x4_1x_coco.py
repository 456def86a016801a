# (reference: configs/fcos/fcos_r50_caffe_fpn_gn-head_4x4_1x_coco.py)
_base_ = './fcos_r50_fpn_1x_bonai.py'
model = dict(
    pretrained='open-mmlab://detectron2/resnet50_caffe',
    backbone=dict(norm_cfg=dict(type='BN', requires_grad=False),
                  norm_eval=True, style='caffe'))
