# (reference: configs/nas_fcos/
#  nas_fcos_fcoshead_r50_caffe_fpn_gn-head_4x4_1x_coco.py — the searched
#  FPN with the standard FCOS head towers)
_base_ = './nas_fcos_nashead_r50_caffe_fpn_gn-head_4x4_1x_coco.py'
model = dict(
    bbox_head=dict(_delete_=True, type='FCOSHead', num_classes=80,
                   in_channels=256, stacked_convs=4, feat_channels=256,
                   strides=[8, 16, 32, 64, 128],
                   norm_cfg=dict(type='GN', num_groups=32),
                   loss_cls=dict(type='FocalLoss', use_sigmoid=True,
                                 gamma=2.0, alpha=0.25, loss_weight=1.0),
                   loss_bbox=dict(type='IoULoss', loss_weight=1.0),
                   loss_centerness=dict(type='CrossEntropyLoss',
                                        use_sigmoid=True,
                                        loss_weight=1.0)))
