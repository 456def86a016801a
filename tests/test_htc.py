"""Hybrid Task Cascade (reference ``mmdet/models/roi_heads/
htc_roi_head.py`` + ``detectors/htc.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu.models import build_detector

from test_models_forward import demo_batch


def _htc_cfg():
    stage_bbox = dict(num_classes=1, in_channels=32, fc_out_channels=32,
                      reg_class_agnostic=True,
                      bbox_coder=dict(target_means=[0.0] * 4,
                                      target_stds=[0.1, 0.1, 0.2, 0.2]))
    return dict(
        type="HTC",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      anchor_generator=dict(scales=[8],
                                            ratios=[0.5, 1.0, 2.0],
                                            strides=[4, 8, 16, 32, 64])),
        roi_head=dict(
            type="HybridTaskCascadeRoIHead",
            num_stages=2,
            stage_loss_weights=[1.0, 0.5],
            interleaved=True,
            mask_info_flow=True,
            bbox_roi_extractor=dict(
                roi_layer=dict(output_size=7, sampling_ratio=2),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            bbox_head=[dict(stage_bbox), dict(stage_bbox)],
            mask_roi_extractor=dict(
                roi_layer=dict(output_size=14, sampling_ratio=2),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            mask_head=dict(num_convs=1, in_channels=32,
                           conv_out_channels=32, num_classes=1),
            semantic_roi_extractor=dict(
                roi_layer=dict(output_size=14, sampling_ratio=2),
                out_channels=32, featmap_strides=[8]),
            semantic_head=dict(num_ins=5, fusion_level=1, num_convs=1,
                               in_channels=32, conv_out_channels=32,
                               num_classes=4,
                               loss_seg=dict(loss_weight=0.2))))


def _train_cfg():
    stage = dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                               min_pos_iou=0.5),
                 sampler=dict(num=32, pos_fraction=0.25), mask_size=28)
    return dict(
        rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                               min_pos_iou=0.3),
                 sampler=dict(num=32, pos_fraction=0.5)),
        rpn_proposal=dict(nms_pre=100, nms_post=64, max_num=64,
                          nms_thr=0.7),
        rcnn=[dict(stage), dict(stage)])


@pytest.fixture(scope="module")
def htc_run():
    model = build_detector(
        _htc_cfg(), _train_cfg(),
        dict(rpn=dict(nms_pre=100, nms_post=64, max_num=64, nms_thr=0.7),
             rcnn=dict(score_thr=0.05,
                       nms=dict(type="nms", iou_threshold=0.5),
                       max_per_img=8)))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, variables


def test_htc_train_losses_and_grads(htc_run):
    model, variables = htc_run
    batch = demo_batch(0, b=2, size=128)
    r = np.random.RandomState(0)
    batch["gt_semantic_seg"] = jnp.asarray(
        r.randint(0, 4, (2, 16, 16)), jnp.int32)
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        losses = model.apply({"params": p, **other}, batch,
                             method="forward_train",
                             rngs={"sampling": jax.random.PRNGKey(2)})
        return sum(jnp.sum(v) for v in losses.values()), losses

    (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    expect = {"loss_rpn_cls", "loss_rpn_bbox", "loss_semantic",
              "s0.loss_cls", "s0.loss_bbox", "s0.loss_mask",
              "s1.loss_cls", "s1.loss_bbox", "s1.loss_mask"}
    assert set(losses) == expect
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    def total(tree):
        return sum(float(jnp.abs(g).sum())
                   for g in jax.tree_util.tree_leaves(tree))
    assert total(grads["semantic_head"]) > 0
    for i in range(2):
        assert total(grads[f"mask_head_{i}"]) > 0, i
        assert total(grads[f"bbox_head_{i}"]) > 0, i
    # info flow: stage-1 head receives the stage-0 feature via conv_res
    assert "conv_res" in grads["mask_head_1"]
    assert total(grads["mask_head_1"]["conv_res"]) > 0


def test_htc_simple_test(htc_run):
    model, variables = htc_run
    b, size = 2, 128
    img = jnp.asarray(np.random.RandomState(1).randn(b, size, size, 3),
                      jnp.float32)
    out = model.apply(variables, img, jnp.full((b, 2), float(size)),
                      jnp.ones((b,)), method="simple_test")
    assert out["det_bboxes"].shape == (b, 8, 4)
    assert out["mask_probs"].shape[:2] == (b, 8)
    mp = np.asarray(out["mask_probs"])
    assert np.isfinite(mp).all() and mp.min() >= 0 and mp.max() <= 1
