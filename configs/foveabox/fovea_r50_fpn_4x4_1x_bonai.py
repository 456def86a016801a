# FoveaBox (reference family: configs/foveabox/fovea_r50_fpn_4x4_1x_coco.py).
_base_ = ['../_base_/datasets/bonai_instance.py',
          '../_base_/schedules/schedule_2x_bonai.py']
model = dict(
    type='FoveaBox',
    pretrained='torchvision://resnet50',
    backbone=dict(type='ResNet', depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_eval=True, style='pytorch'),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, start_level=1, add_extra_convs=True,
              num_outs=5),
    bbox_head=dict(num_classes=1, in_channels=256, feat_channels=256,
                   stacked_convs=4, sigma=0.4,
                   strides=[8, 16, 32, 64, 128],
                   base_edge_list=[16, 32, 64, 128, 256],
                   scale_ranges=((1, 64), (32, 128), (64, 256), (128, 512),
                                 (256, 2048)),
                   loss_cls=dict(type='FocalLoss', use_sigmoid=True,
                                 gamma=1.5, alpha=0.4, loss_weight=1.0),
                   loss_bbox=dict(type='SmoothL1Loss', beta=0.11,
                                  loss_weight=1.0)))
train_cfg = dict()
test_cfg = dict(nms_pre=1000, score_thr=0.05,
                nms=dict(type='nms', iou_threshold=0.5), max_per_img=100)
