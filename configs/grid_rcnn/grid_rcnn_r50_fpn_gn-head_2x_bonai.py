# Grid R-CNN (reference family:
# configs/grid_rcnn/grid_rcnn_r50_fpn_gn-head_2x_coco.py) — cls-only
# second stage (with_reg=False); localisation by grid-point heatmap
# voting (GridHead, 9 points, spatial information fusion).
_base_ = ['../_base_/models/faster_rcnn_r50_fpn.py',
          '../_base_/datasets/bonai_instance.py',
          '../_base_/schedules/schedule_2x_bonai.py']
model = dict(
    type='GridRCNN',
    roi_head=dict(
        bbox_head=dict(num_classes=1, with_reg=False),
        grid_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=14,
                           sampling_ratio=0),
            out_channels=256, featmap_strides=[4, 8, 16, 32]),
        grid_head=dict(type='GridHead', grid_points=9, num_convs=8,
                       in_channels=256, point_feat_channels=64,
                       loss_grid=dict(type='CrossEntropyLoss',
                                      use_sigmoid=True, loss_weight=15))))
train_cfg = dict(
    rpn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                           neg_iou_thr=0.3, min_pos_iou=0.3,
                           match_low_quality=True, ignore_iof_thr=-1),
             sampler=dict(type='RandomSampler', num=256, pos_fraction=0.5,
                          neg_pos_ub=-1, add_gt_as_proposals=False),
             allowed_border=0, pos_weight=-1, debug=False),
    rpn_proposal=dict(nms_across_levels=False, nms_pre=2000, nms_post=2000,
                      max_num=2000, nms_thr=0.7, min_bbox_size=0),
    rcnn=dict(
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                      neg_iou_thr=0.5, min_pos_iou=0.5,
                      match_low_quality=False, ignore_iof_thr=-1),
        sampler=dict(type='RandomSampler', num=512, pos_fraction=0.25,
                     neg_pos_ub=-1, add_gt_as_proposals=True),
        pos_radius=1, pos_weight=-1, max_num_grid=192, debug=False))
test_cfg = dict(
    rpn=dict(nms_across_levels=False, nms_pre=1000, nms_post=1000,
             max_num=1000, nms_thr=0.7, min_bbox_size=0),
    rcnn=dict(score_thr=0.03, nms=dict(type='nms', iou_threshold=0.3),
              max_per_img=100))
