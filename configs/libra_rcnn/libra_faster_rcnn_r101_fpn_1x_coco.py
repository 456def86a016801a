# (reference: configs/libra_rcnn/libra_faster_rcnn_r101_fpn_1x_coco.py)
_base_ = './libra_faster_rcnn_r50_fpn_1x_coco.py'
model = dict(pretrained='torchvision://resnet101',
             backbone=dict(depth=101))
