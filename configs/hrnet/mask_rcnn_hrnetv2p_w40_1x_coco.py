# (reference: configs/hrnet/mask_rcnn_hrnetv2p_w40_1x_coco.py)
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'

model = dict(
    pretrained='open-mmlab://msra/hrnetv2_w40',
    backbone=dict(
        _delete_=True,
        type='HRNet',
        frozen_stages=1,
        norm_eval=True,
        extra=dict(
            stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                        num_blocks=(4,), num_channels=(64,)),
            stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                        num_blocks=(4, 4), num_channels=(40, 80)),
            stage3=dict(num_modules=4, num_branches=3, block='BASIC',
                        num_blocks=(4, 4, 4), num_channels=(40, 80, 160)),
            stage4=dict(num_modules=3, num_branches=4, block='BASIC',
                        num_blocks=(4, 4, 4, 4), num_channels=(40, 80, 160, 320)))),
    neck=dict(
        _delete_=True,
        type='HRFPN',
        in_channels=[40, 80, 160, 320],
        out_channels=256,
        num_outs=5))
