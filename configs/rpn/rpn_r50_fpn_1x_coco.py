# (reference: configs/rpn/rpn_r50_fpn_1x_coco.py)
_base_ = ['../_base_/models/faster_rcnn_r50_fpn.py',
          '../_base_/datasets/coco_detection.py',
          '../_base_/schedules/schedule_1x.py',
          '../_base_/default_runtime.py']
model = dict(type='RPN', roi_head=None)
train_cfg = dict(
    rpn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                           neg_iou_thr=0.3, min_pos_iou=0.3,
                           match_low_quality=True, ignore_iof_thr=-1),
             sampler=dict(type='RandomSampler', num=256, pos_fraction=0.5,
                          neg_pos_ub=-1, add_gt_as_proposals=False),
             allowed_border=0, pos_weight=-1, debug=False),
    rpn_proposal=dict(nms_across_levels=False, nms_pre=2000, nms_post=2000,
                      max_num=2000, nms_thr=0.7, min_bbox_size=0))
test_cfg = dict(
    rpn=dict(nms_across_levels=False, nms_pre=1000, nms_post=1000,
             max_num=1000, nms_thr=0.7, min_bbox_size=0))
