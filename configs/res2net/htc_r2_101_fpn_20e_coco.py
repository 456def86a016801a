# (reference: configs/res2net/htc_r2_101_fpn_20e_coco.py)
_base_ = '../htc/htc_r50_fpn_1x_coco.py'
model = dict(
    pretrained='open-mmlab://res2net101_v1d_26w_4s',
    backbone=dict(type='Res2Net', depth=101, scales=4, base_width=26))
lr_config = dict(step=[16, 19])
total_epochs = 20
