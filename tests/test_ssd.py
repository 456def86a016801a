"""SSD: VGG backbone shapes, SSD anchors, MultiBox loss semantics
(reference ``mmdet/models/backbones/ssd_vgg.py``,
``mmdet/models/dense_heads/ssd_head.py``,
``mmdet/core/anchor/anchor_generator.py:351-455``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonai_tpu.models import build_detector


TRAIN_CFG = dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                               min_pos_iou=0.0),
                 smoothl1_beta=1.0, neg_pos_ratio=3)
TEST_CFG = dict(nms=dict(type="nms", iou_threshold=0.45), score_thr=0.02,
                max_per_img=20)


def _build():
    m = build_detector(
        dict(type="SSD",
             backbone=dict(type="SSDVGG", input_size=300, depth=16),
             bbox_head=dict(num_classes=1,
                            anchor_generator=dict(
                                strides=[8, 16, 32, 64, 100, 300],
                                ratios=[[2], [2, 3], [2, 3], [2, 3],
                                        [2], [2]],
                                basesize_ratio_range=(0.15, 0.9),
                                input_size=300))),
        TRAIN_CFG, TEST_CFG)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)))
    return m, v


def test_vgg_level_shapes():
    """SSD300 pyramid: 38/19/10/5/3/1 with the reference channel plan
    (ssd_vgg.py docstring example)."""
    from bonai_tpu.models.backbones.ssd_vgg import SSDVGG
    bb = SSDVGG(input_size=300)
    v = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)))
    outs = bb.apply(v, jnp.zeros((1, 300, 300, 3)))
    shapes = [tuple(o.shape[1:]) for o in outs]
    assert shapes == [(38, 38, 512), (19, 19, 1024), (10, 10, 512),
                      (5, 5, 256), (3, 3, 256), (1, 1, 256)]


def test_vgg512_level_shapes():
    from bonai_tpu.models.backbones.ssd_vgg import SSDVGG
    bb = SSDVGG(input_size=512)
    v = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)))
    outs = bb.apply(v, jnp.zeros((1, 512, 512, 3)))
    shapes = [tuple(o.shape[1:]) for o in outs]
    assert shapes == [(64, 64, 512), (32, 32, 1024), (16, 16, 512),
                      (8, 8, 256), (4, 4, 256), (2, 2, 256),
                      (1, 1, 256)]


def test_l2norm_unit_scale():
    """conv4_3 output rows have L2 norm == l2_norm_scale per pixel when
    the learned scale is at its init value."""
    from bonai_tpu.models.backbones.ssd_vgg import SSDVGG
    bb = SSDVGG(input_size=300, l2_norm_scale=20.0)
    v = bb.init(jax.random.PRNGKey(1), jnp.zeros((1, 300, 300, 3)))
    outs = bb.apply(v, jnp.asarray(
        np.random.RandomState(0).randn(1, 300, 300, 3), jnp.float32))
    n = np.linalg.norm(np.asarray(outs[0][0, 5, 5]), ord=2)
    assert n == pytest.approx(20.0, rel=1e-3)


def test_ssd_anchor_counts_and_sizes():
    """SSD300-COCO anchors: 4/6/6/6/4/4 per cell; level-0 pair is the
    fixed (21, 45) from the 0.15 range head (reference :392-395)."""
    from bonai_tpu.core.anchors import SSDAnchorGenerator
    ag = SSDAnchorGenerator(strides=[8, 16, 32, 64, 100, 300],
                            ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]],
                            basesize_ratio_range=(0.15, 0.9),
                            input_size=300)
    assert ag.num_base_anchors == [4, 6, 6, 6, 4, 4]
    b0 = ag.base_anchors[0]
    # anchor 0: min_size square (21) centred on the stride-8 cell centre
    w0 = b0[0, 2] - b0[0, 0]
    assert w0 == pytest.approx(21.0)
    # anchor 1: sqrt(21*45) square
    w1 = b0[1, 2] - b0[1, 0]
    assert w1 == pytest.approx(np.sqrt(21 * 45), rel=1e-6)
    # anchors 2/3: ratio pair at min size (w/h and h/w swapped)
    w2, h2 = b0[2, 2] - b0[2, 0], b0[2, 3] - b0[2, 1]
    w3, h3 = b0[3, 2] - b0[3, 0], b0[3, 3] - b0[3, 1]
    assert w2 == pytest.approx(h3, rel=1e-6)
    assert h2 == pytest.approx(w3, rel=1e-6)
    assert w2 * h2 == pytest.approx(21 * 21, rel=1e-5)
    # total anchors over the SSD300 grid = the canonical 8732
    total = sum(n * h * w for n, (h, w) in zip(
        ag.num_base_anchors,
        [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]))
    assert total == 8732


def test_hard_negative_mining_ratio():
    """With uniform cls losses the mined negatives are exactly 3x the
    positives (reference ``ssd_head.py:162-169``)."""
    from bonai_tpu.models.dense_heads.ssd_head import ssd_loss
    # 1 level, 8x8 grid, 1 anchor/cell, 1 class
    anchors = []
    for y in range(8):
        for x in range(8):
            anchors.append([x * 8, y * 8, x * 8 + 16, y * 8 + 16])
    anchors = jnp.asarray(anchors, jnp.float32)
    gt = jnp.asarray([[[0., 0., 16., 16.]]])
    cls = [jnp.zeros((1, 8, 8, 2))]          # uniform logits
    reg = [jnp.zeros((1, 8, 8, 4))]
    losses = ssd_loss(cls, reg, anchors, gt, jnp.ones((1, 1), bool),
                      jnp.zeros((1, 1), jnp.int32), 1, TRAIN_CFG)
    # uniform CE = log(2); positives: anchor(0,0) IoU=1 (+ maybe
    # low-quality matches); mined negs = 3x pos
    npos = 1
    expect = (npos + 3 * npos) * np.log(2) / npos
    assert float(losses["loss_cls"]) == pytest.approx(expect, rel=1e-4)
    assert float(losses["loss_bbox"]) >= 0


def test_loss_finite_and_differentiable():
    m, v = _build()
    r = np.random.RandomState(0)
    batch = dict(
        image=jnp.asarray(r.randn(1, 300, 300, 3), jnp.float32),
        gt_bboxes=jnp.asarray([[[30., 40., 120., 150.],
                                [200., 180., 280., 260.]]]),
        gt_labels=jnp.zeros((1, 2), jnp.int32),
        gt_valid=jnp.ones((1, 2), bool))

    def total(params):
        losses = m.apply({"params": params}, batch,
                         method="forward_train")
        return sum(jnp.asarray(x, jnp.float32) for x in losses.values())

    val, grads = jax.value_and_grad(total)(v["params"])
    assert np.isfinite(float(val)) and float(val) > 0
    gnorm = float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                               for x in jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0


def test_simple_test_shapes():
    m, v = _build()
    out = m.apply(v, jnp.zeros((2, 300, 300, 3)),
                  jnp.full((2, 2), 300.0), jnp.ones((2,)),
                  method="simple_test")
    assert out["det_bboxes"].shape == (2, 20, 4)
    assert out["det_valid"].dtype == bool
