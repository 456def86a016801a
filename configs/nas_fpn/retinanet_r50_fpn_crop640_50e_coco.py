# (reference: configs/nas_fpn/retinanet_r50_fpn_crop640_50e_coco.py)
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
norm_cfg = dict(type='BN', requires_grad=True)
model = dict(
    pretrained='torchvision://resnet50',
    backbone=dict(norm_cfg=norm_cfg, norm_eval=False),
    neck=dict(relu_before_extra_convs=True, no_norm_on_lateral=True,
              norm_cfg=norm_cfg),
    bbox_head=dict(type='RetinaSepBNHead', num_ins=5, norm_cfg=norm_cfg))
train_cfg = dict(assigner=dict(neg_iou_thr=0.5))
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
data = dict(
    samples_per_gpu=8, workers_per_gpu=4,
    train=dict(pipeline=[
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations', with_bbox=True),
        dict(type='Resize', img_scale=(640, 640),
             ratio_range=(0.8, 1.2), keep_ratio=True),
        dict(type='RandomCrop', crop_size=(640, 640)),
        dict(type='RandomFlip', flip_ratio=0.5),
        dict(type='Normalize', **img_norm_cfg),
        dict(type='Pad', size=(640, 640)),
        dict(type='DefaultFormatBundle'),
        dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
    ]))
optimizer = dict(type='SGD', lr=0.08, momentum=0.9, weight_decay=0.0001,
                 paramwise_cfg=dict(norm_decay_mult=0,
                                    bypass_duplicate=True))
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy='step', warmup='linear', warmup_iters=1000,
                 warmup_ratio=0.1, step=[30, 40])
total_epochs = 50
