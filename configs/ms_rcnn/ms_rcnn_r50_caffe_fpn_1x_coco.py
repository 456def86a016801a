# (reference: configs/ms_rcnn/ms_rcnn_r50_caffe_fpn_1x_coco.py)
_base_ = '../mask_rcnn/mask_rcnn_r50_caffe_fpn_1x_coco.py'
model = dict(roi_head=dict(
    mask_iou_head=dict(num_convs=4, num_fcs=2, in_channels=256,
                       conv_out_channels=256, fc_out_channels=1024,
                       num_classes=80,
                       loss_iou=dict(loss_weight=0.5))))
