# Double-Head Faster R-CNN (reference family: configs/double_heads/
# dh_faster_rcnn_r50_fpn_1x_coco.py).
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(
    roi_head=dict(
        type='DoubleHeadRoIHead',
        reg_roi_scale_factor=1.3,
        bbox_head=dict(type='DoubleConvFCBBoxHead', num_convs=4,
                       num_fcs=2, in_channels=256,
                       conv_out_channels=1024, fc_out_channels=1024,
                       num_classes=1, reg_class_agnostic=False,
                       bbox_coder=dict(target_means=[0.0] * 4,
                                       target_stds=[0.1, 0.1, 0.2, 0.2]))))
