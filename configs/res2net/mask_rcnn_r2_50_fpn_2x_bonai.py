# Res2Net-50 backbone (reference family: configs/res2net/).
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_2x_bonai.py']
model = dict(
    pretrained=None,
    backbone=dict(type='Res2Net', depth=50, scales=4, base_width=26,
                  deep_stem=True, avg_down=True))
