import jax
import jax.numpy as jnp
import numpy as np

from bonai_tpu.models import build_detector
from test_models_forward import demo_batch


def tiny_cascade_cfg():
    stage_head = lambda stds: dict(
        num_classes=1, in_channels=32, fc_out_channels=32,
        reg_class_agnostic=True,
        bbox_coder=dict(target_means=[0.] * 4, target_stds=stds))
    return dict(
        type="CascadeRCNN",
        backbone=dict(type="ResNet", depth=18, frozen_stages=-1,
                      out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      anchor_generator=dict(scales=[8],
                                            ratios=[0.5, 1.0, 2.0],
                                            strides=[4, 8, 16, 32, 64])),
        roi_head=dict(
            type="CascadeRoIHead",
            bbox_roi_extractor=dict(
                roi_layer=dict(output_size=7, sampling_ratio=2),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            bbox_head=[stage_head([0.1, 0.1, 0.2, 0.2]),
                       stage_head([0.05, 0.05, 0.1, 0.1]),
                       stage_head([0.033, 0.033, 0.067, 0.067])],
            mask_roi_extractor=dict(
                roi_layer=dict(output_size=14, sampling_ratio=2),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            mask_head=dict(num_convs=1, in_channels=32,
                           conv_out_channels=32, num_classes=1)))


def _stage_cfg(thr):
    return dict(assigner=dict(pos_iou_thr=thr, neg_iou_thr=thr,
                              min_pos_iou=thr, match_low_quality=False),
                sampler=dict(num=32, pos_fraction=0.25), mask_size=28)


def test_cascade_train_and_test():
    model = build_detector(
        tiny_cascade_cfg(),
        train_cfg=dict(
            rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                   min_pos_iou=0.3),
                     sampler=dict(num=32, pos_fraction=0.5)),
            rpn_proposal=dict(nms_pre=100, nms_post=64, max_num=64,
                              nms_thr=0.7),
            rcnn=[_stage_cfg(0.5), _stage_cfg(0.6), _stage_cfg(0.7)]),
        test_cfg=dict(rpn=dict(nms_pre=100, nms_post=64, max_num=64,
                               nms_thr=0.7),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(type="nms", iou_threshold=0.5),
                                max_per_img=8)))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    batch = demo_batch(0, b=1, size=128, g=6)
    losses = model.apply(variables, batch, method="forward_train",
                         rngs={"sampling": jax.random.PRNGKey(1)})
    keys = set(losses)
    for i in range(3):
        assert f"s{i}.loss_cls" in keys and f"s{i}.loss_bbox" in keys
    assert "loss_mask" in keys
    for v in losses.values():
        assert np.isfinite(float(v))
    out = model.apply(variables, batch["image"], batch["img_shape"],
                      jnp.ones((1,)), method="simple_test")
    assert out["det_bboxes"].shape == (1, 8, 4)
    assert out["mask_probs"].shape[0] == 1
