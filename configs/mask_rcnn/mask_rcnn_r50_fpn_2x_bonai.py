# Mask R-CNN R50-FPN on BONAI roof masks (no offset head) — BASELINE.json
# config #2 (reference analog: LOFT config without the offset branch)
_base_ = ['../_base_/models/bonai_loft_foa_r50_fpn_basic.py',
          '../_base_/datasets/bonai_instance.py',
          '../_base_/schedules/schedule_2x_bonai.py',
          '../_base_/default_runtime.py']

model = dict(
    type='MaskRCNN',
    roi_head=dict(
        type='StandardRoIHead',
        offset_roi_extractor=None,
        offset_head=None))
train_pipeline_collect_keys = ['img', 'gt_bboxes', 'gt_labels', 'gt_masks']
