"""FCOS anchor-free detector (reference
``mmdet/models/dense_heads/fcos_head.py``, ``detectors/fcos.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu.models import build_detector
from bonai_tpu.models.dense_heads.fcos_head import (fcos_points,
                                                    fcos_targets)


def test_fcos_points_grid():
    pts = fcos_points([(4, 4), (2, 2)], [8, 16])
    assert pts[0].shape == (16, 2)
    np.testing.assert_allclose(pts[0][0], [4.0, 4.0])      # stride//2
    np.testing.assert_allclose(pts[0][5], [12.0, 12.0])
    np.testing.assert_allclose(pts[1][0], [8.0, 8.0])


def test_fcos_targets_assignment():
    """A point inside two boxes takes the smaller-area one; range gating
    pushes large boxes to coarse levels (reference :459-545)."""
    pts = jnp.asarray([[16.0, 16.0], [100.0, 100.0]])
    ranges = jnp.asarray([[-1.0, 64.0], [-1.0, 64.0]])
    gt = jnp.asarray([[0.0, 0.0, 40.0, 40.0],       # small, contains p0
                      [0.0, 0.0, 120.0, 120.0]])    # big, contains both
    gv = jnp.ones((2,), bool)
    gl = jnp.zeros((2,), jnp.int32)
    labels, tgt, ctr = fcos_targets(pts, ranges, gt, gv, gl, num_classes=1)
    # p0: both gts contain it; smaller area wins
    assert int(labels[0]) == 0
    np.testing.assert_allclose(np.asarray(tgt[0]), [16, 16, 24, 24])
    # p1: only the big gt contains it, but its max dist (100) > range 64
    assert int(labels[1]) == 1                       # background
    # centerness of p0: sqrt(min/max * min/max) = sqrt(16/24 * 16/24)
    np.testing.assert_allclose(float(ctr[0]), 16.0 / 24.0, rtol=1e-5)

    # padded gt must never match
    labels2, _, _ = fcos_targets(pts, ranges, gt, jnp.asarray([True, False]),
                                 gl, num_classes=1)
    assert int(labels2[1]) == 1


def _fcos_cfg():
    return dict(
        type="FCOS",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, num_outs=5, start_level=1,
                  add_extra_convs=True),
        bbox_head=dict(num_classes=1, in_channels=32, feat_channels=32,
                       stacked_convs=1, strides=[8, 16, 32, 64, 128],
                       loss_cls=dict(gamma=2.0, alpha=0.25)))


@pytest.fixture(scope="module")
def fcos_run():
    model = build_detector(
        _fcos_cfg(), train_cfg=dict(),
        test_cfg=dict(nms_pre=200, score_thr=0.05,
                      nms=dict(type="nms", iou_threshold=0.5),
                      max_per_img=16))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, variables


def test_fcos_forward_train_and_grads(fcos_run):
    model, variables = fcos_run
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
    # per-level reg scales must receive gradient
    assert float(jnp.abs(grads["bbox_head"]["scale0"])) >= 0


def test_fcos_simple_test_shapes(fcos_run):
    model, variables = fcos_run
    b, size = 2, 128
    img = jnp.asarray(np.random.RandomState(1).randn(b, size, size, 3),
                      jnp.float32)
    out = model.apply(variables, img, jnp.full((b, 2), float(size)),
                      jnp.ones((b,)), method="simple_test")
    assert out["det_bboxes"].shape == (b, 16, 4)
    assert out["det_scores"].shape == (b, 16)
    bx = np.asarray(out["det_bboxes"])
    assert np.all(np.isfinite(bx))
    v = np.asarray(out["det_valid"])
    assert (bx[v][:, 2] >= bx[v][:, 0]).all() if v.any() else True


def test_nasfcos_forward_train_and_test():
    """NAS-FCOS: searched FPN cells + dconv towers (reference
    ``mmdet/models/detectors/nasfcos.py``)."""
    from bonai_tpu.models import build_detector
    m = build_detector(
        dict(type="NASFCOS",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="NASFCOS_FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, start_level=1, num_outs=5),
             bbox_head=dict(num_classes=1, in_channels=16,
                            feat_channels=32,
                            strides=[8, 16, 32, 64, 128])),
        dict(), dict(nms_pre=100, score_thr=0.05,
                     nms=dict(type="nms", iou_threshold=0.6),
                     max_per_img=10))
    batch = _batch() if "_batch" in dir() else None
    import numpy as np
    import jax
    import jax.numpy as jnp
    r = np.random.RandomState(0)
    size, b, g = 64, 2, 3
    xy1 = r.uniform(0, size * 0.4, (b, g, 2)).astype(np.float32)
    wh = r.uniform(12, size * 0.4, (b, g, 2)).astype(np.float32)
    batch = dict(
        image=jnp.asarray(r.randn(b, size, size, 3), jnp.float32),
        img_shape=jnp.full((b, 2), float(size)),
        gt_bboxes=jnp.asarray(
            np.concatenate([xy1, np.minimum(xy1 + wh, size - 1)], -1)),
        gt_labels=jnp.zeros((b, g), jnp.int32),
        gt_valid=jnp.ones((b, g), bool))
    v = m.init({"params": jax.random.PRNGKey(0)}, batch,
               method="forward_train")
    assert "neck" in v["params"] and "c61" in v["params"]["neck"]

    def total(params):
        losses = m.apply(
            {"params": params, "batch_stats": v.get("batch_stats", {})},
            batch, method="forward_train")
        return sum(jnp.asarray(x, jnp.float32)
                   for k, x in losses.items() if k.startswith("loss"))

    val, grads = jax.value_and_grad(total)(v["params"])
    assert np.isfinite(float(val)) and float(val) > 0
    gn = float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                            for x in jax.tree_util.tree_leaves(
                                grads["bbox_head"]))))
    assert np.isfinite(gn) and gn > 0
    out = m.apply({"params": v["params"],
                   "batch_stats": v.get("batch_stats", {})},
                  batch["image"], batch["img_shape"], jnp.ones((2,)),
                  method="simple_test")
    assert out["det_bboxes"].shape == (2, 10, 4)
