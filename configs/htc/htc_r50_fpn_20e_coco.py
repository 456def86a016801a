# (reference: configs/htc/htc_r50_fpn_20e_coco.py)
_base_ = './htc_r50_fpn_1x_coco.py'
lr_config = dict(step=[16, 19])
total_epochs = 20
