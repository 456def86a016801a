# Cascade Mask R-CNN (reference family: configs/cascade_rcnn/
# cascade_mask_rcnn_r50_fpn_1x_coco.py) on BONAI buildings.
_base_ = ['../_base_/datasets/bonai_instance.py',
          '../_base_/schedules/schedule_2x_bonai.py']
_stage = dict(num_classes=1, in_channels=256, fc_out_channels=1024,
              reg_class_agnostic=True)
model = dict(
    type='CascadeRCNN',
    pretrained='torchvision://resnet50',
    backbone=dict(type='ResNet', depth=50, num_stages=4,
                  out_indices=(0, 1, 2, 3), frozen_stages=1,
                  norm_eval=True, style='pytorch'),
    neck=dict(type='FPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, num_outs=5),
    rpn_head=dict(type='RPNHead', in_channels=256, feat_channels=256,
                  anchor_generator=dict(scales=[8], ratios=[0.5, 1.0, 2.0],
                                        strides=[4, 8, 16, 32, 64])),
    roi_head=dict(
        type='CascadeRoIHead',
        num_stages=3,
        stage_loss_weights=[1, 0.5, 0.25],
        bbox_roi_extractor=dict(
            roi_layer=dict(type='RoIAlign', output_size=7,
                           sampling_ratio=2),
            out_channels=256, featmap_strides=[4, 8, 16, 32]),
        bbox_head=[
            dict(_stage, bbox_coder=dict(target_means=[0.] * 4,
                                         target_stds=[0.1, 0.1, 0.2, 0.2])),
            dict(_stage, bbox_coder=dict(target_means=[0.] * 4,
                                         target_stds=[0.05, 0.05, 0.1,
                                                      0.1])),
            dict(_stage, bbox_coder=dict(target_means=[0.] * 4,
                                         target_stds=[0.033, 0.033, 0.067,
                                                      0.067]))],
        mask_roi_extractor=dict(
            roi_layer=dict(type='RoIAlign', output_size=14,
                           sampling_ratio=2),
            out_channels=256, featmap_strides=[4, 8, 16, 32]),
        mask_head=dict(num_convs=4, in_channels=256,
                       conv_out_channels=256, num_classes=1)))
_stage_train = dict(
    assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5),
    sampler=dict(type='RandomSampler', num=512, pos_fraction=0.25),
    mask_size=28)
train_cfg = dict(
    rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                           min_pos_iou=0.3),
             sampler=dict(type='RandomSampler', num=256, pos_fraction=0.5)),
    rpn_proposal=dict(nms_pre=2000, nms_post=2000, max_num=2000,
                      nms_thr=0.7),
    rcnn=[
        dict(_stage_train),
        dict(_stage_train,
             assigner=dict(pos_iou_thr=0.6, neg_iou_thr=0.6,
                           min_pos_iou=0.6)),
        dict(_stage_train,
             assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.7,
                           min_pos_iou=0.7))])
test_cfg = dict(
    rpn=dict(nms_pre=1000, nms_post=1000, max_num=1000, nms_thr=0.7),
    rcnn=dict(score_thr=0.05, nms=dict(type='nms', iou_threshold=0.5),
              max_per_img=100, mask_thr_binary=0.5))
