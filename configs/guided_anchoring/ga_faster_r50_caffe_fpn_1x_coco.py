# (reference: configs/guided_anchoring/ga_faster_r50_caffe_fpn_1x_coco.py)
_base_ = './ga_faster_r50_fpn_1x_coco.py'
model = dict(
    pretrained='open-mmlab://detectron2/resnet50_caffe',
    backbone=dict(norm_cfg=dict(type='BN', requires_grad=False),
                  norm_eval=True, style='caffe'))
