# (reference: configs/ssd/ssd300_coco.py)
_base_ = ['../_base_/datasets/coco_detection.py',
          '../_base_/schedules/schedule_2x.py',
          '../_base_/default_runtime.py']
input_size = 300
model = dict(
    type='SSD',
    pretrained='open-mmlab://vgg16_caffe',
    backbone=dict(type='SSDVGG', input_size=input_size, depth=16,
                  with_last_pool=False, ceil_mode=True,
                  out_indices=(3, 4), out_feature_indices=(22, 34),
                  l2_norm_scale=20),
    neck=None,
    bbox_head=dict(type='SSDHead',
                   in_channels=(512, 1024, 512, 256, 256, 256),
                   num_classes=80,
                   anchor_generator=dict(
                       type='SSDAnchorGenerator', scale_major=False,
                       input_size=input_size,
                       basesize_ratio_range=(0.15, 0.9),
                       strides=[8, 16, 32, 64, 100, 300],
                       ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]]),
                   bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                   target_means=[.0, .0, .0, .0],
                                   target_stds=[0.1, 0.1, 0.2, 0.2])))
train_cfg = dict(
    assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.5,
                  min_pos_iou=0.0, ignore_iof_thr=-1,
                  gt_max_assign_all=False),
    smoothl1_beta=1.0, allowed_border=-1, pos_weight=-1,
    neg_pos_ratio=3, debug=False)
test_cfg = dict(nms=dict(type='nms', iou_threshold=0.45),
                min_bbox_size=0, score_thr=0.02, max_per_img=200)
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53], std=[1, 1, 1],
                    to_rgb=True)
data = dict(
    samples_per_gpu=8, workers_per_gpu=3,
    train=dict(pipeline=[
        dict(type='LoadImageFromFile', to_float32=True),
        dict(type='LoadAnnotations', with_bbox=True),
        dict(type='PhotoMetricDistortion', brightness_delta=32,
             contrast_range=(0.5, 1.5), saturation_range=(0.5, 1.5),
             hue_delta=18),
        dict(type='Expand', mean=img_norm_cfg['mean'],
             to_rgb=img_norm_cfg['to_rgb'], ratio_range=(1, 4)),
        dict(type='MinIoURandomCrop',
             min_ious=(0.1, 0.3, 0.5, 0.7, 0.9), min_crop_size=0.3),
        dict(type='Resize', img_scale=(300, 300), keep_ratio=False),
        dict(type='Normalize', **img_norm_cfg),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
    ]))
optimizer = dict(type='SGD', lr=2e-3, momentum=0.9, weight_decay=5e-4)
