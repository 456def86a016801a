# FreeAnchor (reference family:
# configs/free_anchor/retinanet_free_anchor_r50_fpn_1x_coco.py).
_base_ = ['../_base_/datasets/bonai_instance.py',
          '../_base_/schedules/schedule_2x_bonai.py']
model = dict(
    type='FreeAnchor',
    pretrained='torchvision://resnet50',
    backbone=dict(type='ResNet', depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_eval=True, style='pytorch'),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=1, add_extra_convs=True,
              num_outs=5),
    bbox_head=dict(num_classes=1, in_channels=256, feat_channels=256,
                   stacked_convs=4, pre_anchor_topk=50, bbox_thr=0.6,
                   gamma=2.0, alpha=0.5,
                   anchor_generator=dict(octave_base_scale=4,
                                         scales_per_octave=3,
                                         ratios=[0.5, 1.0, 2.0],
                                         strides=[8, 16, 32, 64, 128]),
                   bbox_coder=dict(target_means=[0.0] * 4,
                                   target_stds=[1.0] * 4),
                   loss_bbox=dict(type='SmoothL1Loss', beta=0.11,
                                  loss_weight=0.75)))
train_cfg = dict()
test_cfg = dict(nms_pre=1000, score_thr=0.05,
                nms=dict(type='nms', iou_threshold=0.5), max_per_img=100)
