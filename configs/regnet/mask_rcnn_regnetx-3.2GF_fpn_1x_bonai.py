# RegNetX-3.2GF backbone (reference family: configs/regnet/).
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_2x_bonai.py']
model = dict(
    pretrained=None,
    backbone=dict(type='RegNet', arch='regnetx_3.2gf', frozen_stages=1),
    neck=dict(in_channels=[96, 192, 432, 1008]))
