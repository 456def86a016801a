# Hybrid Task Cascade (reference family: configs/htc/htc_r50_fpn_1x_coco.py)
# on BONAI buildings; semantic branch classes = {bg, roof, facade, ground}.
_base_ = ['../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_bonai.py']
model = dict(
    type='HTC',
    roi_head=dict(
        type='HybridTaskCascadeRoIHead',
        interleaved=True,
        mask_info_flow=True,
        semantic_roi_extractor=dict(
            roi_layer=dict(type='RoIAlign', output_size=14,
                           sampling_ratio=2),
            out_channels=256, featmap_strides=[8]),
        semantic_head=dict(num_ins=5, fusion_level=1, num_convs=4,
                           in_channels=256, conv_out_channels=256,
                           num_classes=4,
                           loss_seg=dict(loss_weight=0.2))))
