# Libra R-CNN (reference family:
# configs/libra_rcnn/libra_faster_rcnn_r50_fpn_1x_coco.py) — BFP neck
# (non-local refine), IoU-balanced negative sampling, BalancedL1 reg.
_base_ = ['../_base_/models/faster_rcnn_r50_fpn.py',
          '../_base_/datasets/bonai_instance.py',
          '../_base_/schedules/schedule_2x_bonai.py']
model = dict(
    neck=[
        dict(type='FPN', in_channels=[256, 512, 1024, 2048],
             out_channels=256, num_outs=5),
        dict(type='BFP', in_channels=256, num_levels=5, refine_level=2,
             refine_type='non_local')],
    roi_head=dict(bbox_head=dict(
        num_classes=1,
        loss_bbox=dict(type='BalancedL1Loss', alpha=0.5, gamma=1.5,
                       beta=1.0, loss_weight=1.0))))
train_cfg = dict(
    rpn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                           neg_iou_thr=0.3, min_pos_iou=0.3,
                           match_low_quality=True, ignore_iof_thr=-1),
             sampler=dict(type='RandomSampler', num=256, pos_fraction=0.5,
                          neg_pos_ub=5, add_gt_as_proposals=False),
             allowed_border=-1, pos_weight=-1, debug=False),
    rpn_proposal=dict(nms_across_levels=False, nms_pre=2000, nms_post=2000,
                      max_num=2000, nms_thr=0.7, min_bbox_size=0),
    rcnn=dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                      neg_iou_thr=0.5, min_pos_iou=0.5,
                      match_low_quality=False, ignore_iof_thr=-1),
        sampler=dict(type='IoUBalancedNegSampler', num=512,
                     pos_fraction=0.25, floor_thr=-1, floor_fraction=0,
                     num_bins=3, neg_pos_ub=-1, add_gt_as_proposals=True),
        pos_weight=-1, debug=False))
test_cfg = dict(
    rpn=dict(nms_across_levels=False, nms_pre=1000, nms_post=1000,
             max_num=1000, nms_thr=0.7, min_bbox_size=0),
    rcnn=dict(score_thr=0.05, nms=dict(type='nms', iou_threshold=0.5),
              max_per_img=100))
