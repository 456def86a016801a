# (reference: configs/fsaf/fsaf_r50_fpn_1x_coco.py)
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
model = dict(
    type='FSAF',
    bbox_head=dict(
        _delete_=True,
        type='FSAFHead', num_classes=80, in_channels=256,
        feat_channels=256, stacked_convs=4,
        strides=[8, 16, 32, 64, 128],
        reg_decoded_bbox=True,
        loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0, reduction='none'),
        loss_bbox=dict(_delete_=True, type='IoULoss', eps=1e-6,
                       loss_weight=1.0, reduction='none')))
train_cfg = dict(
    _delete_=True,
    assigner=dict(type='CenterRegionAssigner', pos_scale=0.2,
                  neg_scale=0.2, min_pos_iof=0.01),
    allowed_border=-1, pos_weight=-1, debug=False)
