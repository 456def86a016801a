"""ATSS assigner + detector (reference
``mmdet/core/bbox/assigners/atss_assigner.py``,
``mmdet/models/dense_heads/atss_head.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu.core.assigners import atss_assign
from bonai_tpu.models import build_detector


def _grid_anchors(size, stride, scale):
    xs = (np.arange(size // stride) + 0.5) * stride
    gx, gy = np.meshgrid(xs, xs)
    half = stride * scale / 2
    return np.stack([gx.ravel() - half, gy.ravel() - half,
                     gx.ravel() + half, gy.ravel() + half], -1)


def test_atss_assign_adaptive_threshold():
    """The anchor centred on the gt must be positive; anchors far away
    negative; padded gts never match; every positive's center is inside
    its gt (reference :138-155)."""
    a8 = _grid_anchors(64, 8, 1.0)
    a16 = _grid_anchors(64, 16, 1.0)
    anchors = jnp.asarray(np.concatenate([a8, a16], 0), jnp.float32)
    nla = [len(a8), len(a16)]
    gt = jnp.asarray([[16.0, 16.0, 32.0, 32.0],
                      [0.0, 0.0, 0.0, 0.0]], jnp.float32)
    gv = jnp.asarray([True, False])
    assigned, max_ov = atss_assign(anchors, nla, gt, gv, topk=4)
    assigned = np.asarray(assigned)
    anc = np.asarray(anchors)
    pos = assigned > 0
    assert pos.sum() > 0
    assert (assigned[pos] == 1).all()          # padded gt 2 never assigned
    cx = (anc[:, 0] + anc[:, 2]) / 2
    cy = (anc[:, 1] + anc[:, 3]) / 2
    assert ((cx[pos] > 16) & (cx[pos] < 32)).all()
    assert ((cy[pos] > 16) & (cy[pos] < 32)).all()
    # the best-IoU anchor is positive
    best = np.argmax(np.asarray(max_ov))
    assert assigned[best] == 1
    # no gts at all -> all background
    a2, _ = atss_assign(anchors, nla, gt, jnp.zeros(2, bool), topk=4)
    assert (np.asarray(a2) == 0).all()


def test_atss_assign_conflict_keeps_best_iou():
    """An anchor claimed by two gts keeps the higher-IoU one
    (reference :157-165)."""
    anchors = jnp.asarray([[0.0, 0.0, 32.0, 32.0]])
    gt = jnp.asarray([[0.0, 0.0, 30.0, 30.0],     # IoU ~0.79
                      [0.0, 0.0, 16.0, 32.0]])    # IoU 0.5
    gv = jnp.ones(2, bool)
    assigned, _ = atss_assign(anchors, [1], gt, gv, topk=1)
    assert int(assigned[0]) == 1


def _atss_cfg():
    return dict(
        type="ATSS",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, num_outs=5, start_level=1,
                  add_extra_convs=True),
        bbox_head=dict(num_classes=1, in_channels=32, feat_channels=32,
                       stacked_convs=1,
                       anchor_generator=dict(
                           ratios=[1.0], octave_base_scale=8,
                           scales_per_octave=1,
                           strides=[8, 16, 32, 64, 128]),
                       bbox_coder=dict(target_means=[0.0] * 4,
                                       target_stds=[0.1, 0.1, 0.2, 0.2]),
                       loss_bbox=dict(loss_weight=2.0)))


@pytest.fixture(scope="module")
def atss_run():
    model = build_detector(
        _atss_cfg(), train_cfg=dict(assigner=dict(topk=9)),
        test_cfg=dict(nms_pre=200, score_thr=0.05,
                      nms=dict(type="nms", iou_threshold=0.6),
                      max_per_img=16))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, variables


def test_atss_forward_train_and_grads(atss_run):
    model, variables = atss_run
    r = np.random.RandomState(0)
    b, size, g = 2, 128, 4
    batch = {
        "image": jnp.asarray(r.randn(b, size, size, 3), jnp.float32),
        "gt_bboxes": jnp.asarray([[[10, 10, 60, 50], [70, 70, 120, 120],
                                   [0, 0, 30, 30], [0, 0, 0, 0]]] * b,
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
    assert set(losses) == {"loss_cls", "loss_bbox", "loss_centerness"}
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) >= 0, k
    gnorm = sum(float(jnp.abs(x).sum())
                for x in jax.tree_util.tree_leaves(grads["bbox_head"]))
    assert np.isfinite(gnorm) and gnorm > 0


def test_atss_simple_test_shapes(atss_run):
    model, variables = atss_run
    b, size = 2, 128
    img = jnp.asarray(np.random.RandomState(1).randn(b, size, size, 3),
                      jnp.float32)
    out = model.apply(variables, img, jnp.full((b, 2), float(size)),
                      jnp.ones((b,)), method="simple_test")
    assert out["det_bboxes"].shape == (b, 16, 4)
    assert np.all(np.isfinite(np.asarray(out["det_bboxes"])))
