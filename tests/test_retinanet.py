import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu.models import build_detector

from test_models_forward import demo_batch


def tiny_retina_cfg():
    return dict(
        type="RetinaNet",
        backbone=dict(type="ResNet", depth=18, frozen_stages=-1,
                      out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1, num_outs=5,
                  add_extra_convs="on_input"),
        bbox_head=dict(
            type="RetinaHead", num_classes=3, in_channels=32,
            feat_channels=32, stacked_convs=1,
            anchor_generator=dict(octave_base_scale=4, scales_per_octave=3,
                                  ratios=[0.5, 1.0, 2.0],
                                  strides=[8, 16, 32, 64, 128])))


def test_retinanet_train_and_test():
    model = build_detector(
        tiny_retina_cfg(),
        train_cfg=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.4,
                                     min_pos_iou=0)),
        test_cfg=dict(nms_pre=200, score_thr=0.05,
                      nms=dict(type="nms", iou_threshold=0.5),
                      max_per_img=10))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    batch = demo_batch(0, b=2, size=128, g=6)
    batch["gt_labels"] = jnp.asarray(
        np.random.RandomState(0).randint(0, 3, (2, 6)), jnp.int32)
    losses = model.apply(variables, batch, method="forward_train")
    assert set(losses) == {"loss_cls", "loss_bbox"}
    for v in losses.values():
        assert np.isfinite(float(v))
    # focal bias init -> small initial cls loss relative to plain CE
    assert float(losses["loss_cls"]) < 10.0

    out = model.apply(variables, batch["image"], batch["img_shape"],
                      jnp.ones((2,)), method="simple_test")
    assert out["det_bboxes"].shape == (2, 10, 4)
    assert out["det_labels"].max() < 3
