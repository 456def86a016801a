# Mixed precision (reference family:
# configs/fp16/mask_rcnn_r50_fpn_fp16_1x_coco.py).  TPU-native analog:
# bf16 compute / fp32 params+losses — no loss scaling needed (bf16
# keeps fp32's exponent range), so fp16_cfg's loss_scale is absent by
# design.
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_2x_bonai.py']
compute_dtype = 'bfloat16'
