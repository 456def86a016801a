# LOFT + FOA, ResNet-50 FPN, 2x schedule on BONAI
# (reference: configs/loft_foa/loft_foa_r50_fpn_2x_bonai.py)
_base_ = [
    '../_base_/models/bonai_loft_foa_r50_fpn_basic.py',
    '../_base_/datasets/bonai_instance.py',
    '../_base_/schedules/schedule_2x_bonai.py',
    '../_base_/default_runtime.py',
]
