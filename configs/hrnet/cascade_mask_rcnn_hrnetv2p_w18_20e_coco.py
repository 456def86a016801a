# (reference: configs/hrnet/cascade_mask_rcnn_hrnetv2p_w18_20e_coco.py)
_base_ = '../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py'

model = dict(
    pretrained='open-mmlab://msra/hrnetv2_w18',
    backbone=dict(
        _delete_=True,
        type='HRNet',
        frozen_stages=1,
        norm_eval=True,
        extra=dict(
            stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                        num_blocks=(4,), num_channels=(64,)),
            stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                        num_blocks=(4, 4), num_channels=(18, 36)),
            stage3=dict(num_modules=4, num_branches=3, block='BASIC',
                        num_blocks=(4, 4, 4), num_channels=(18, 36, 72)),
            stage4=dict(num_modules=3, num_branches=4, block='BASIC',
                        num_blocks=(4, 4, 4, 4), num_channels=(18, 36, 72, 144)))),
    neck=dict(
        _delete_=True,
        type='HRFPN',
        in_channels=[18, 36, 72, 144],
        out_channels=256,
        num_outs=5))
lr_config = dict(step=[16, 19])
total_epochs = 20
