# (reference: configs/pisa/pisa_ssd300_coco.py)
_base_ = '../ssd/ssd300_bonai.py'
train_cfg = dict(
    isr=dict(k=2.0, bias=0.0),
    carl=dict(k=1.0, bias=0.2, loss_weight=1.0))
