# (reference: configs/cornernet/
#  cornernet_hourglass104_mstest_32x3_210e_coco.py — 32 GPUs x 3 imgs)
_base_ = './cornernet_hourglass104_mstest_8x6_210e_coco.py'
data = dict(samples_per_gpu=3, workers_per_gpu=3)
optimizer = dict(type='Adam', lr=0.001)
