# (reference: configs/htc/
#  htc_x101_64x4d_fpn_dconv_c3-c5_mstrain_400_1400_16x1_20e_coco.py)
_base_ = './htc_x101_64x4d_fpn_16x1_20e_coco.py'
model = dict(
    backbone=dict(
        dcn=dict(type='DCN', deform_groups=1, fallback_on_stride=False),
        stage_with_dcn=(False, True, True, True)))
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
data = dict(
    samples_per_gpu=1, workers_per_gpu=1,
    train=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True, with_mask=True,
             with_seg=True),
        dict(type='Resize', img_scale=[(1600, 400), (1600, 1400)],
             multiscale_mode='range', keep_ratio=True),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Normalize', **img_norm_cfg),
        dict(type='Pad', size_divisor=32),
        dict(type='SegRescale', scale_factor=1 / 8),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect',
             keys=['img', 'gt_bboxes', 'gt_labels', 'gt_masks',
                   'gt_semantic_seg']),
    ]))
