# (reference: configs/guided_anchoring/ga_faster_r50_fpn_1x_coco.py)
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'

model = dict(
    rpn_head=dict(
        _delete_=True,
        type='GARPNHead', in_channels=256, feat_channels=256,
        loc_filter_thr=0.01,
        approx_anchor_generator=dict(octave_base_scale=8,
                                     scales_per_octave=3,
                                     ratios=[0.5, 1.0, 2.0],
                                     strides=[4, 8, 16, 32, 64]),
        square_anchor_generator=dict(ratios=[1.0], scales=[8],
                                     strides=[4, 8, 16, 32, 64])))
train_cfg = dict(
    rpn=dict(center_ratio=0.2, ignore_ratio=0.5,
             ga_assigner=dict(type='ApproxMaxIoUAssigner',
                              pos_iou_thr=0.7, neg_iou_thr=0.3,
                              min_pos_iou=0.3),
             ga_sampler=dict(type='RandomSampler', num=256,
                             pos_fraction=0.5),
             assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                           min_pos_iou=0.3),
             sampler=dict(type='RandomSampler', num=256,
                          pos_fraction=0.5)))

test_cfg = dict(rpn=dict(nms_pre=1000, nms_post=1000, max_num=300,
                         nms_thr=0.7))
