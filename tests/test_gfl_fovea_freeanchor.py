"""GFL / FoveaBox / FreeAnchor: forward, loss semantics, gradients,
inference (round-3 long-tail families; reference
``mmdet/models/dense_heads/{gfl_head,fovea_head,
free_anchor_retina_head}.py``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonai_tpu.models import build_detector


COMMON = dict(
    backbone=dict(depth=18, base_channels=8),
    neck=dict(in_channels=[8, 16, 32, 64], out_channels=16, num_outs=5,
              start_level=1, add_extra_convs="on_output"))
TEST_CFG = dict(score_thr=0.05, nms=dict(type="nms", iou_threshold=0.5),
                max_per_img=10, nms_pre=100)


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


def _build(typ, **bh):
    head = dict(num_classes=1, in_channels=16, feat_channels=16,
                stacked_convs=1)
    head.update(bh)
    m = build_detector(dict(type=typ, bbox_head=head, **COMMON),
                       dict(assigner=dict(topk=9)), TEST_CFG)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return m, v


@pytest.mark.parametrize("typ,extra", [
    ("GFL", dict(reg_max=8)),
    ("FoveaBox", dict()),
    ("FreeAnchor", dict(pre_anchor_topk=8)),
])
def test_loss_finite_and_differentiable(typ, extra):
    m, v = _build(typ, **extra)
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


@pytest.mark.parametrize("typ,extra", [
    ("GFL", dict(reg_max=8)),
    ("FoveaBox", dict()),
    ("FreeAnchor", dict(pre_anchor_topk=8)),
])
def test_simple_test_shapes_and_validity(typ, extra):
    m, v = _build(typ, **extra)
    out = m.apply(v, jnp.zeros((2, 64, 64, 3)), jnp.full((2, 2), 64.0),
                  jnp.ones((2,)), method="simple_test")
    assert out["det_bboxes"].shape == (2, 10, 4)
    assert out["det_valid"].dtype == bool
    b = np.asarray(out["det_bboxes"])
    assert (b[..., 2] >= b[..., 0] - 1e-3).all()


def test_gfl_integral_expectation():
    from bonai_tpu.models.dense_heads.gfl_head import integral
    # delta distribution at bin 3 -> expectation 3
    logits = np.full((1, 4 * 9), -20.0, np.float32)
    for side in range(4):
        logits[0, side * 9 + 3] = 20.0
    d = integral(jnp.asarray(logits), 8)
    np.testing.assert_allclose(np.asarray(d), 3.0, atol=1e-4)
    # uniform distribution -> expectation = (0+...+8)/9 = 4
    d = integral(jnp.zeros((1, 36)), 8)
    np.testing.assert_allclose(np.asarray(d), 4.0, atol=1e-5)


def test_gfl_dfl_target_zero_when_perfect():
    """QFL score target equals decoded IoU: a perfect prediction yields
    near-zero bbox loss contribution."""
    from bonai_tpu.models.dense_heads.gfl_head import _giou
    a = jnp.asarray([[0., 0., 10., 10.]])
    iou, giou = _giou(a, a)
    assert float(iou[0]) == pytest.approx(1.0)
    assert float(giou[0]) == pytest.approx(1.0)


def test_fovea_targets_smallest_gt_wins():
    from bonai_tpu.models.dense_heads.fovea_head import fovea_targets_level
    # two nested gts on one level: the cell inside both must take the
    # smaller one's label (reference sorts by descending area so the
    # smallest paints last)
    gb = jnp.asarray([[0., 0., 64., 64.], [16., 16., 40., 40.]])
    gv = jnp.asarray([True, True])
    gl = jnp.asarray([0, 1], jnp.int32)
    labels, tgt, pos = fovea_targets_level(
        gb, gv, gl, h=16, w=16, stride=4.0, base_len=16.0,
        bounds=(0.0, 1000.0), sigma=0.5, num_classes=2)
    lab = np.asarray(labels).reshape(16, 16)
    # center cell (28/4=7) lies in the small gt's fovea -> label 1
    assert lab[7, 7] == 1
    # corner of the big gt's fovea but outside the small gt's -> label 0
    # (big fovea covers cells [4..11]^2 at sigma=0.5, small covers [5..8]^2)
    assert lab[4, 4] == 0
    # log-targets are finite and clamped into [log(1/16), log(16)]
    t = np.asarray(tgt)
    assert np.isfinite(t).all()
    assert (t >= np.log(1 / 16) - 1e-6).all() and \
        (t <= np.log(16) + 1e-6).all()


def test_fovea_scale_range_gates_levels():
    from bonai_tpu.models.dense_heads.fovea_head import fovea_targets_level
    gb = jnp.asarray([[0., 0., 20., 20.]])     # sqrt-area 20
    gv = jnp.asarray([True])
    gl = jnp.asarray([0], jnp.int32)
    # level accepts only areas in [64, 128]: no positives
    labels, _, pos = fovea_targets_level(
        gb, gv, gl, h=8, w=8, stride=8.0, base_len=32.0,
        bounds=(64.0, 128.0), sigma=0.4, num_classes=1)
    assert int(np.asarray(pos).sum()) == 0
    assert (np.asarray(labels) == 1).all()     # all background


def test_free_anchor_bag_semantics():
    """A confident, well-localised anchor drives its gt's positive bag
    loss toward zero; padded gts contribute nothing."""
    from bonai_tpu.models.dense_heads.free_anchor_head import (
        free_anchor_loss)
    # one level, 4 anchors on a 2x2 grid of stride 32
    anchors = jnp.asarray([[0., 0., 32., 32.], [32., 0., 64., 32.],
                           [0., 32., 32., 64.], [32., 32., 64., 64.]])
    gt = jnp.asarray([[[0., 0., 32., 32.], [0., 0., 0., 0.]]])
    gv = jnp.asarray([[True, False]])
    gl = jnp.zeros((1, 2), jnp.int32)

    def run(conf):
        cls = jnp.full((1, 2, 2, 1), -8.0).at[0, 0, 0, 0].set(conf)
        reg = jnp.zeros((1, 2, 2, 4))
        return free_anchor_loss(
            [cls], [reg], anchors, gt, gv, gl, num_classes=1,
            pre_anchor_topk=2)

    lo = run(-8.0)
    hi = run(8.0)
    assert float(hi["positive_bag_loss"]) < float(lo["positive_bag_loss"])
    # padded gt excluded: num_pos is 1, loss finite
    assert np.isfinite(float(hi["negative_bag_loss"]))
