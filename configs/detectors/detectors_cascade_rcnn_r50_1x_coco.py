# (reference: configs/detectors/detectors_cascade_rcnn_r50_1x_coco.py)
# SAC + RFP combined (the full DetectoRS recipe).
_base_ = './cascade_rcnn_r50_rfp_1x_coco.py'
model = dict(
    backbone=dict(sac=dict(type='SAC', use_deform=True),
                  stage_with_sac=(False, True, True, True)),
    neck=dict(rfp_backbone=dict(
        sac=dict(type='SAC', use_deform=True),
        stage_with_sac=(False, True, True, True))))
