# (reference: configs/lvis/mask_rcnn_x101_32x4d_fpn_sample1e-3_mstrain_2x_lvis_v0.5.py)
_base_ = './mask_rcnn_x101_32x4d_fpn_sample1e-3_mstrain_1x_lvis_v1.py'
data = dict(
    train=dict(dataset=dict(
        ann_file='data/lvis_v0.5/annotations/lvis_v0.5_train.json',
        img_prefix='data/lvis_v0.5/train2017/')),
    val=dict(ann_file='data/lvis_v0.5/annotations/lvis_v0.5_val.json',
             img_prefix='data/lvis_v0.5/val2017/'),
    test=dict(ann_file='data/lvis_v0.5/annotations/lvis_v0.5_val.json',
              img_prefix='data/lvis_v0.5/val2017/'))
lr_config = dict(step=[16, 22])
total_epochs = 24
