# (reference: configs/fp16/faster_rcnn_r50_fpn_fp16_1x_coco.py)
# TPU-native mixed precision: bf16 compute / fp32 params — bf16 keeps
# fp32's exponent range so the reference's loss_scale=512 is unneeded.
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
compute_dtype = 'bfloat16'
fp16 = dict(loss_scale=512.)
