# (reference: configs/res2net/mask_rcnn_r2_101_fpn_2x_coco.py)
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_2x_coco.py'
model = dict(
    pretrained='open-mmlab://res2net101_v1d_26w_4s',
    backbone=dict(type='Res2Net', depth=101, scales=4, base_width=26))
