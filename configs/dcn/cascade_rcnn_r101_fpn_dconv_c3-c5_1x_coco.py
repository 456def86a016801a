# (reference: configs/dcn/cascade_rcnn_r101_fpn_dconv_c3-c5_1x_coco.py)
_base_ = './cascade_rcnn_r50_fpn_dconv_c3-c5_1x_coco.py'
model = dict(pretrained='torchvision://resnet101',
             backbone=dict(depth=101))
