# Fast R-CNN on precomputed proposals (reference family:
# configs/fast_rcnn/ — second stage only; proposals supplied per batch
# via data['proposals']).
_base_ = ['../_base_/models/faster_rcnn_r50_fpn.py',
          '../_base_/datasets/bonai_instance.py',
          '../_base_/schedules/schedule_2x_bonai.py']
model = dict(type='FastRCNN',
             roi_head=dict(bbox_head=dict(num_classes=1)))
train_cfg = dict(
    rcnn=dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                      neg_iou_thr=0.5, min_pos_iou=0.5,
                      match_low_quality=False, ignore_iof_thr=-1),
        sampler=dict(type='RandomSampler', num=512, pos_fraction=0.25,
                     neg_pos_ub=-1, add_gt_as_proposals=True),
        pos_weight=-1, debug=False))
test_cfg = dict(
    rcnn=dict(score_thr=0.05, nms=dict(type='nms', iou_threshold=0.5),
              max_per_img=100))
