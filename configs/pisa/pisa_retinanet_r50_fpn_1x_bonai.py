# PISA RetinaNet (reference family:
# configs/pisa/pisa_retinanet_r50_fpn_1x_coco.py) — ISR-P importance
# reweighting + CARL on the all-anchor retina loss.
_base_ = ['../retinanet/retinanet_r50_fpn_1x_coco.py']
train_cfg = dict(
    isr=dict(k=2.0, bias=0.0),
    carl=dict(k=1.0, bias=0.2, loss_weight=5.0))
