"""FSAF anchor-free head with online feature selection (reference
``mmdet/models/dense_heads/fsaf_head.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu.models import build_detector
from bonai_tpu.models.dense_heads.fsaf_head import (decode_tblr,
                                                    fsaf_level_masks,
                                                    fsaf_tblr_targets)


def test_center_region_ownership():
    """The shrunken (0.2) center region is positive; contested cells go
    to the smaller gt; background owner is -1."""
    gt = jnp.asarray([[0.0, 0.0, 80.0, 80.0],    # big
                      [16.0, 16.0, 64.0, 64.0]])  # smaller, nested center
    gv = jnp.ones(2, bool)
    in_pos, owner = fsaf_level_masks(gt, gv, 10, 10, 8, pos_scale=0.2)
    own = np.asarray(owner)
    # center cell (5,5): inside both regions -> smaller gt (1) wins
    assert own[5, 5] == 1
    # corner cell: background
    assert own[0, 0] == -1
    # big gt's region is 16px wide around center 40 -> cells 4..5
    assert np.asarray(in_pos)[0, 4, 4]
    # padded gt never owns
    _, own2 = fsaf_level_masks(gt, jnp.asarray([True, False]), 10, 10, 8)
    assert (np.asarray(own2) != 1).all()


def test_tblr_roundtrip():
    """decode(encode(gt)) == gt at every cell inside the gt."""
    gt = jnp.asarray([[8.0, 16.0, 72.0, 64.0]])
    tblr = fsaf_tblr_targets(gt, 10, 10, 8)[0]         # (H, W, 4)
    boxes = decode_tblr(tblr, 10, 10, 8).reshape(10, 10, 4)
    np.testing.assert_allclose(np.asarray(boxes[3, 4]),
                               np.asarray(gt[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(boxes[7, 8]),
                               np.asarray(gt[0]), atol=1e-4)


def _fsaf_cfg():
    return dict(
        type="FSAF",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, num_outs=5, start_level=1,
                  add_extra_convs=True),
        bbox_head=dict(num_classes=1, in_channels=32, feat_channels=32,
                       stacked_convs=1, strides=[8, 16, 32, 64, 128]))


@pytest.fixture(scope="module")
def fsaf_run():
    model = build_detector(
        _fsaf_cfg(), train_cfg=dict(assigner=dict(pos_scale=0.2)),
        test_cfg=dict(nms_pre=200, score_thr=0.05,
                      nms=dict(type="nms", iou_threshold=0.5),
                      max_per_img=16))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, variables


def test_fsaf_train_and_grads(fsaf_run):
    model, variables = fsaf_run
    r = np.random.RandomState(0)
    b, size, g = 2, 128, 4
    batch = {
        "image": jnp.asarray(r.randn(b, size, size, 3), jnp.float32),
        "gt_bboxes": jnp.asarray([[[10, 10, 60, 50], [70, 70, 120, 120],
                                   [0, 0, 40, 40], [0, 0, 0, 0]]] * b,
                                 jnp.float32),
        "gt_valid": jnp.asarray([[True, True, True, False]] * b),
        "gt_labels": jnp.zeros((b, g), jnp.int32),
    }
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        losses = model.apply({"params": p, **other}, batch,
                             method="forward_train")
        return sum(jnp.sum(v) for v in losses.values()), losses

    (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert set(losses) == {"loss_cls", "loss_bbox"}
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) >= 0, k
    gnorm = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(grads["bbox_head"]))
    assert np.isfinite(gnorm) and gnorm > 0
    # zero-gt batch must stay finite
    batch0 = dict(batch, gt_valid=jnp.zeros((b, g), bool))
    (_, l0), _ = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    for k, v in l0.items():
        assert np.isfinite(float(v)), k


def test_fsaf_simple_test(fsaf_run):
    model, variables = fsaf_run
    b, size = 2, 128
    img = jnp.asarray(np.random.RandomState(1).randn(b, size, size, 3),
                      jnp.float32)
    out = model.apply(variables, img, jnp.full((b, 2), float(size)),
                      jnp.ones((b,)), method="simple_test")
    assert out["det_bboxes"].shape == (b, 16, 4)
    assert np.isfinite(np.asarray(out["det_bboxes"])).all()
