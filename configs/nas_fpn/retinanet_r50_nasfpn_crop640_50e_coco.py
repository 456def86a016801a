# (reference: configs/nas_fpn/retinanet_r50_nasfpn_crop640_50e_coco.py)
_base_ = './retinanet_r50_fpn_crop640_50e_coco.py'
model = dict(
    backbone=dict(input_size=256),   # build-sweep trace size (P7 > 0)
    neck=dict(_delete_=True, type='NASFPN',
              in_channels=[256, 512, 1024, 2048],
              out_channels=256, num_outs=5, stack_times=7,
              start_level=1, norm_cfg=dict(type='BN', requires_grad=True)),
    bbox_head=dict(type='RetinaSepBNHead', num_ins=5,
                   norm_cfg=dict(type='BN', requires_grad=True)))
