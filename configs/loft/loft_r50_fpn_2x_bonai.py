# LOFT with the plain offset head (no FOA) — the reference's
# offset_rcnn_r50_2x recipe (BASELINE.json config #3; reference analog:
# configs/loft/ variants with OffsetHead instead of OffsetHeadExpandFeature)
_base_ = ['../loft_foa/loft_foa_r50_fpn_2x_bonai.py']

model = dict(
    roi_head=dict(
        offset_head=dict(
            _delete_=True,
            type='OffsetHead',
            num_convs=4,
            num_fcs=2,
            fc_out_channels=1024,
            loss_offset=dict(type='SmoothL1Loss', loss_weight=16.0))))
