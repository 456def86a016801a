"""Shared reduced-size LOFT config for smoke/perf scripts."""


def small_loft_cfg(num_convs_offset=4):
    model_cfg = dict(
        type="LOFT",
        backbone=dict(type="ResNet", depth=50, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=-1),
        neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
                  out_channels=256, num_outs=5),
        rpn_head=dict(
            type="RPNHead", in_channels=256, feat_channels=256,
            anchor_generator=dict(scales=[8], ratios=[0.5, 1.0, 2.0],
                                  strides=[4, 8, 16, 32, 64])),
        roi_head=dict(
            type="LoftRoIHead",
            bbox_roi_extractor=dict(
                roi_layer=dict(output_size=7, sampling_ratio=2),
                out_channels=256, featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(num_classes=1, in_channels=256,
                           fc_out_channels=1024,
                           bbox_coder=dict(
                               target_means=[0., 0., 0., 0.],
                               target_stds=[0.1, 0.1, 0.2, 0.2])),
            mask_roi_extractor=dict(
                roi_layer=dict(output_size=14, sampling_ratio=2),
                out_channels=256, featmap_strides=[4, 8, 16, 32]),
            mask_head=dict(num_convs=4, in_channels=256,
                           conv_out_channels=256, num_classes=1),
            offset_roi_extractor=dict(
                roi_layer=dict(output_size=7, sampling_ratio=2),
                out_channels=256, featmap_strides=[4, 8, 16, 32]),
            offset_head=dict(type="OffsetHeadExpandFeature",
                             expand_feature_num=4, share_expand_fc=True,
                             rotations=[0, 90, 180, 270],
                             num_convs=num_convs_offset, num_fcs=2,
                             in_channels=256, conv_out_channels=256,
                             fc_out_channels=1024,
                             loss_offset=dict(type="SmoothL1Loss",
                                              loss_weight=16.0))))
    train_cfg = dict(
        rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                               min_pos_iou=0.3, match_low_quality=True),
                 sampler=dict(num=256, pos_fraction=0.5)),
        rpn_proposal=dict(nms_pre=600, nms_post=512, max_num=512,
                          nms_thr=0.7, min_bbox_size=0),
        rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                min_pos_iou=0.5, match_low_quality=True),
                  sampler=dict(num=256, pos_fraction=0.25),
                  mask_size=28))
    test_cfg = dict(
        rpn=dict(nms_pre=600, nms_post=512, max_num=512, nms_thr=0.7),
        rcnn=dict(score_thr=0.05,
                  nms=dict(type="soft_nms", iou_threshold=0.5),
                  max_per_img=50, mask_thr_binary=0.5))
    return model_cfg, train_cfg, test_cfg
