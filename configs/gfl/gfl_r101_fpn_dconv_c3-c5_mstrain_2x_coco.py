# (reference: configs/gfl/gfl_r101_fpn_dconv_c3-c5_mstrain_2x_coco.py)
_base_ = './gfl_r50_fpn_mstrain_2x_coco.py'
model = dict(
    pretrained='torchvision://resnet101',
    backbone=dict(depth=101,
                  dcn=dict(type='DCN', deform_groups=1,
                           fallback_on_stride=False),
                  stage_with_dcn=(False, True, True, True)))
