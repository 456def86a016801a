# Faster R-CNN R50-C4 (reference: configs/_base_/models/
# faster_rcnn_r50_caffe_c4.py) — the mask-less sibling of
# mask_rcnn_r50_caffe_c4.
_base_ = './mask_rcnn_r50_caffe_c4.py'
model = dict(type='FasterRCNN',
             roi_head=dict(mask_roi_extractor=None, mask_head=None))
