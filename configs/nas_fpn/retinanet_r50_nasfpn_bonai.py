# NAS-FPN (reference family:
# configs/nas_fpn/retinanet_r50_nasfpn_crop640_50e_coco.py) — RetinaNet
# with the searched 9-cell stacked merging pyramid.
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
model = dict(
    backbone=dict(input_size=256),   # build-sweep trace size (P7 > 0)
    neck=dict(type='NASFPN', in_channels=[256, 512, 1024, 2048],
              out_channels=256, num_outs=5, stack_times=7,
              start_level=1))
