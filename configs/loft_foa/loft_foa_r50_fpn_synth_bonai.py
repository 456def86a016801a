# LOFT + FOA on the synthetic BONAI dataset (tools/make_synthetic_bonai.py)
# — the quality-loop recipe for this environment: real BONAI imagery is
# not downloadable here (zero egress), so the full pipeline
# (train -> bonai_test -> bonai_evaluation) is exercised on the richest
# feasible synthetic stand-in.  Model/optimizer identical to
# loft_foa_r50_fpn_2x_bonai.py; only data paths + epoch count differ.
_base_ = [
    '../_base_/models/bonai_loft_foa_r50_fpn_basic.py',
    '../_base_/datasets/bonai_instance.py',
    '../_base_/schedules/schedule_2x_bonai.py',
    '../_base_/default_runtime.py',
]

# no pretrained weights are reachable in this environment: train the
# whole backbone from scratch (no frozen stem, BN in train mode)
model = dict(
    pretrained=None,
    backbone=dict(frozen_stages=-1, norm_eval=False),
)

data_root = 'data/synth_bonai/'
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
train_pipeline = [
    dict(type='LoadImageFromFile', cache_dir=data_root + 'imgcache_train'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=True,
         with_offset=True),
    dict(type='Resize', img_scale=(1024, 1024), keep_ratio=True),
    dict(type='RandomFlip', flip_ratio=0.5,
         direction=['horizontal', 'vertical']),
    # device=True: uint8 across the tunnel (4x fewer bytes/step), the
    # float normalisation fuses into the compiled train step
    dict(type='Normalize', device=True, **img_norm_cfg),
    dict(type='Pad', size_divisor=32),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect',
         keys=['img', 'gt_bboxes', 'gt_labels', 'gt_masks', 'gt_offsets']),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='MultiScaleFlipAug', img_scale=(1024, 1024), flip=False,
         transforms=[
             dict(type='Resize', keep_ratio=True),
             dict(type='RandomFlip', flip_ratio=0.5),
             dict(type='Normalize', **img_norm_cfg),
             dict(type='Pad', size_divisor=32),
             dict(type='ImageToTensor', keys=['img']),
             dict(type='Collect', keys=['img']),
         ])
]
data = dict(
    samples_per_gpu=2,
    workers_per_gpu=4,
    max_gt=256,
    inst_mask_size=112,
    train=dict(type='BONAI', ann_file=data_root + 'train/train.json',
               img_prefix=data_root + 'train/images/',
               bbox_type='building', mask_type='roof',
               pipeline=train_pipeline),
    val=dict(type='BONAI', ann_file=data_root + 'val/val.json',
             img_prefix=data_root + 'val/images/',
             bbox_type='building', mask_type='roof',
             pipeline=test_pipeline),
    test=dict(type='BONAI', ann_file=data_root + 'val/val.json',
              img_prefix=data_root + 'val/images/',
              bbox_type='building', mask_type='roof',
              pipeline=test_pipeline))
evaluation = dict(interval=0)          # scored via bonai_test/evaluation
# single-chip global batch is 2 (reference lr 0.02 is the 16-image
# value): linear-scaled
optimizer = dict(type='SGD', lr=0.0025, momentum=0.9, weight_decay=0.0001)
total_epochs = 12
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=0.001, step=[8, 11])
checkpoint_config = dict(interval=2)
