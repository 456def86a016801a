# (reference: configs/mask_rcnn/mask_rcnn_r50_fpn_2x_coco.py)
_base_ = ['../_base_/models/mask_rcnn_r50_fpn.py',
          '../_base_/datasets/coco_instance.py',
          '../_base_/schedules/schedule_2x.py',
          '../_base_/default_runtime.py']
