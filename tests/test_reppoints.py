"""RepPoints: moment transform, PointAssigner, loss/inference semantics
(reference ``mmdet/models/dense_heads/reppoints_head.py`` +
``mmdet/core/bbox/assigners/point_assigner.py``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonai_tpu.models import build_detector


COMMON = dict(
    backbone=dict(depth=18, base_channels=8),
    neck=dict(in_channels=[8, 16, 32, 64], out_channels=16, num_outs=5,
              start_level=1))
TRAIN_CFG = dict(
    init=dict(assigner=dict(type="PointAssigner", scale=4, pos_num=1)),
    refine=dict(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                              neg_iou_thr=0.4)))
TEST_CFG = dict(score_thr=0.05, nms=dict(type="nms", iou_threshold=0.5),
                max_per_img=10, nms_pre=100)


def _build():
    head = dict(num_classes=1, in_channels=16, feat_channels=16,
                point_feat_channels=16, stacked_convs=1, num_points=9)
    m = build_detector(dict(type="RepPointsDetector", bbox_head=head,
                            **COMMON), TRAIN_CFG, TEST_CFG)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return m, v


def _batch(b=2, g=3, size=64, seed=0):
    r = np.random.RandomState(seed)
    xy1 = r.uniform(0, size * 0.5, (b, g, 2)).astype(np.float32)
    wh = r.uniform(8, size * 0.4, (b, g, 2)).astype(np.float32)
    return dict(
        image=jnp.asarray(r.randn(b, size, size, 3), jnp.float32),
        img_shape=jnp.full((b, 2), float(size)),
        gt_bboxes=jnp.asarray(
            np.concatenate([xy1, np.minimum(xy1 + wh, size - 1)], -1)),
        gt_labels=jnp.zeros((b, g), jnp.int32),
        gt_valid=jnp.ones((b, g), bool))


def test_moment_transform_degenerate_and_symmetric():
    from bonai_tpu.models.dense_heads.reppoints_head import (
        points2bbox_moment)
    # symmetric point cloud around (10, 20): box centred there
    pts = jnp.asarray([[[8., 18.], [12., 18.], [8., 22.], [12., 22.]]])
    box = np.asarray(points2bbox_moment(pts, jnp.zeros(2)))
    cx, cy = (box[0, 0] + box[0, 2]) / 2, (box[0, 1] + box[0, 3]) / 2
    assert cx == pytest.approx(10.0, abs=1e-4)
    assert cy == pytest.approx(20.0, abs=1e-4)
    # moment_transfer = 0 -> half-extent == std (here 2 in both axes)
    assert box[0, 2] - box[0, 0] == pytest.approx(4.0, abs=1e-4)
    # all points coincident -> zero-size box, no NaN
    pts0 = jnp.full((1, 9, 2), 5.0)
    b0 = np.asarray(points2bbox_moment(pts0, jnp.zeros(2)))
    assert np.isfinite(b0).all()
    assert b0[0, 0] == pytest.approx(5.0) and b0[0, 2] == pytest.approx(5.0)


def test_point_assigner_nearest_level_matched():
    from bonai_tpu.models.dense_heads.reppoints_head import point_assign
    # two levels (lvl 3 = stride 8, lvl 4 = stride 16); gt of size 32
    # with scale=4 maps to lvl log2(32/4) = 3
    pts = jnp.asarray([[8., 8.], [16., 16.], [14., 14.], [16., 16.]])
    lvl = jnp.asarray([3, 3, 3, 4], jnp.int32)
    gt = jnp.asarray([[0., 0., 32., 32.]])     # centre (16, 16)
    assigned = np.asarray(point_assign(pts, lvl, gt, jnp.asarray([True]),
                                       scale=4, pos_num=1))
    # nearest lvl-3 point to the centre is index 1 (exact hit); the
    # equally-near lvl-4 point (index 3) is level-excluded
    assert assigned[1] == 1
    assert assigned[3] == 0
    assert assigned[0] == 0 and assigned[2] == 0


def test_point_assigner_contested_point_goes_to_closest():
    from bonai_tpu.models.dense_heads.reppoints_head import point_assign
    pts = jnp.asarray([[16., 16.]])
    lvl = jnp.asarray([3], jnp.int32)
    # both gts level-3; gt1's centre is nearer to the point
    gt = jnp.asarray([[0., 0., 32., 32.], [2., 2., 34., 34.]])
    gv = jnp.asarray([True, True])
    assigned = np.asarray(point_assign(pts, lvl, gt, gv, scale=4,
                                       pos_num=1))
    assert assigned[0] == 1                    # gt index 0 + 1


def test_loss_finite_and_differentiable():
    m, v = _build()
    batch = _batch()

    def total(params):
        losses = m.apply(
            {"params": params, "batch_stats": v.get("batch_stats", {})},
            batch, method="forward_train")
        return sum(jnp.asarray(x, jnp.float32) for x in losses.values())

    val, grads = jax.value_and_grad(total)(v["params"])
    assert np.isfinite(float(val)) and float(val) > 0
    gnorm = float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                               for x in jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0
    # the moment transfer receives gradient through both stages
    mt = grads["bbox_head"]["moment_transfer"]
    assert np.isfinite(np.asarray(mt)).all()


def test_simple_test_shapes_and_validity():
    m, v = _build()
    out = m.apply(v, jnp.zeros((2, 64, 64, 3)), jnp.full((2, 2), 64.0),
                  jnp.ones((2,)), method="simple_test")
    assert out["det_bboxes"].shape == (2, 10, 4)
    assert out["det_valid"].dtype == bool
    b = np.asarray(out["det_bboxes"])
    assert (b[..., 2] >= b[..., 0] - 1e-3).all()
