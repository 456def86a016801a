# (reference: configs/lvis/mask_rcnn_r50_fpn_sample1e-3_mstrain_1x_lvis_v1.py)
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'
model = dict(roi_head=dict(bbox_head=dict(num_classes=1203),
                           mask_head=dict(num_classes=1203)))
test_cfg = dict(rcnn=dict(score_thr=0.0001,
                          # LVIS allows up to 300 dets per image
                          max_per_img=300))
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True),
    dict(type='Resize',
         img_scale=[(1333, 640), (1333, 672), (1333, 704), (1333, 736),
                    (1333, 768), (1333, 800)],
         multiscale_mode='value', keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels', 'gt_masks']),
]
dataset_type = 'LVISDataset'
data_root = 'data/lvis_v1/'
data = dict(
    samples_per_gpu=2, workers_per_gpu=2,
    train=dict(
        _delete_=True,
        type='ClassBalancedDataset',
        oversample_thr=1e-3,
        dataset=dict(
            type=dataset_type,
            ann_file=data_root + 'annotations/lvis_v1_train.json',
            img_prefix=data_root,
            pipeline=train_pipeline)),
    val=dict(type=dataset_type,
             ann_file=data_root + 'annotations/lvis_v1_val.json',
             img_prefix=data_root),
    test=dict(type=dataset_type,
              ann_file=data_root + 'annotations/lvis_v1_val.json',
              img_prefix=data_root))
evaluation = dict(interval=12, metric=['bbox', 'segm'])
