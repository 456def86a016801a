# DetectoRS (reference family:
# configs/detectors/detectors_cascade_rcnn_r50_1x_coco.py) — Cascade
# R-CNN with SAC (switchable atrous conv) in the backbone and the RFP
# recursive feature pyramid.
_base_ = ['../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_bonai.py']
model = dict(
    backbone=dict(
        type='DetectoRS_ResNet',
        conv_cfg=dict(type='ConvAWS'),
        sac=dict(type='SAC', use_deform=False),
        stage_with_sac=(False, True, True, True),
        output_img=True),
    neck=dict(
        type='RFP',
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        num_outs=5,
        rfp_steps=2,
        aspp_out_channels=64,
        aspp_dilations=(1, 3, 6, 1),
        rfp_backbone=dict(
            type='DetectoRS_ResNet',
            depth=50,
            num_stages=4,
            out_indices=(0, 1, 2, 3),
            frozen_stages=1,
            rfp_inplanes=256,
            conv_cfg=dict(type='ConvAWS'),
            sac=dict(type='SAC', use_deform=False),
            stage_with_sac=(False, True, True, True),
            style='pytorch')))
