# (reference: configs/mask_rcnn/mask_rcnn_r50_fpn_poly_1x_coco.py)
# poly2mask=False keeps masks as polygons end-to-end — the native
# representation of this framework's pipeline.
_base_ = ['../_base_/models/mask_rcnn_r50_fpn.py',
          '../_base_/datasets/coco_instance.py',
          '../_base_/schedules/schedule_1x.py',
          '../_base_/default_runtime.py']
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
data = dict(
    train=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True, with_mask=True,
             poly2mask=False),
        dict(type='Resize', img_scale=(1333, 800), keep_ratio=True),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Normalize', **img_norm_cfg),
        dict(type='Pad', size_divisor=32),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect',
             keys=['img', 'gt_bboxes', 'gt_labels', 'gt_masks']),
    ]))
