# (reference: configs/pisa/pisa_ssd512_coco.py)
_base_ = '../ssd/ssd512_coco.py'
train_cfg = dict(
    isr=dict(k=2.0, bias=0.0),
    carl=dict(k=1.0, bias=0.2, loss_weight=1.0))
