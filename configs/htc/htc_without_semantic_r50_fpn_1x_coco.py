# (reference: configs/htc/htc_without_semantic_r50_fpn_1x_coco.py)
_base_ = ['../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py']
model = dict(
    type='HybridTaskCascade',
    roi_head=dict(
        type='HybridTaskCascadeRoIHead',
        interleaved=True,
        mask_info_flow=True))
