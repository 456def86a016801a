"""Guided Anchoring RPN (reference
``mmdet/models/dense_heads/guided_anchor_head.py`` + ``ga_rpn_head.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu.models import build_detector
from bonai_tpu.models.dense_heads.ga_rpn_head import (
    approx_anchors, decode_guided_anchors, ga_loc_targets, square_anchors)

from test_models_forward import demo_batch, tiny_loft_cfg


def test_square_and_approx_anchors():
    sq = square_anchors([(4, 4)], [8], octave_base_scale=4)[0]
    assert sq.shape == (16, 4)
    # cell (0,0): center (4,4), side 32
    np.testing.assert_allclose(sq[0], [-12, -12, 20, 20])
    ap = approx_anchors([(4, 4)], [8], 4, 3, (0.5, 1.0, 2.0))[0]
    assert ap.shape == (16, 9, 4)
    # ratio-1 approx at the base octave == the square
    np.testing.assert_allclose(ap[0, 1], sq[0], rtol=1e-5)


def test_decode_guided_anchors():
    sq = jnp.asarray([[0.0, 0.0, 32.0, 32.0]])
    dec = decode_guided_anchors(sq, jnp.asarray([[0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(dec), np.asarray(sq), atol=1e-5)
    dec2 = decode_guided_anchors(sq, jnp.asarray([[np.log(2.0), 0.0]]))
    np.testing.assert_allclose(np.asarray(dec2)[0], [-16, 0, 48, 32],
                               atol=1e-4)      # width doubled, centre kept


def test_ga_loc_targets_regions():
    """One 64px gt at stride-8 level: positive center region on its
    target level, weight 0.1 background elsewhere, ignore ring 0."""
    gt = jnp.asarray([[[16.0, 16.0, 80.0, 80.0]]])   # scale 64
    gv = jnp.ones((1, 1), bool)
    # min_anchor_size = 8*4 = 32 -> lvl = floor(log2(64/32)+0.5) = 1
    t, w, avg = ga_loc_targets(gt, gv, [(16, 16), (8, 8), (4, 4)],
                               [4, 8, 16], octave_base_scale=8)
    t0, t1 = np.asarray(t[0][0]), np.asarray(t[1][0])
    w1 = np.asarray(w[1][0])
    assert t0.sum() == 0 and t1.sum() > 0       # painted on level 1 only
    cy = int(48 / 8)
    assert t1[cy, cy] == 1 and w1[cy, cy] == 1  # gt center positive
    assert w1[0, 0] == pytest.approx(0.1)       # far background
    # same-level ignore (r2 < r1) is hidden inside the positive region
    # (reference paints ignore first, positives overwrite); the VISIBLE
    # ignore rings are on the neighbouring levels
    assert (w1 == 0).sum() == 0
    assert (np.asarray(w[0][0]) == 0).any()
    assert (np.asarray(w[2][0]) == 0).any()
    assert avg == pytest.approx((16 * 16 + 8 * 8 + 4 * 4) / 200.0)


def _ga_cfg():
    cfg = tiny_loft_cfg()
    cfg["type"] = "FasterRCNN"
    for k in ("offset_head", "offset_roi_extractor", "mask_head",
              "mask_roi_extractor"):
        cfg["roi_head"].pop(k, None)
    cfg["rpn_head"] = dict(
        type="GARPNHead", in_channels=32, feat_channels=32,
        loc_filter_thr=0.01,
        approx_anchor_generator=dict(octave_base_scale=8,
                                     scales_per_octave=3,
                                     ratios=[0.5, 1.0, 2.0],
                                     strides=[4, 8, 16, 32, 64]))
    return cfg


def _ga_train_cfg():
    return dict(
        rpn=dict(center_ratio=0.2, ignore_ratio=0.5,
                 ga_assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                  min_pos_iou=0.3),
                 ga_sampler=dict(num=64, pos_fraction=0.5),
                 assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                               min_pos_iou=0.3),
                 sampler=dict(num=32, pos_fraction=0.5)),
        rpn_proposal=dict(nms_pre=100, nms_post=64, max_num=64,
                          nms_thr=0.7),
        rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                min_pos_iou=0.5),
                  sampler=dict(num=32, pos_fraction=0.25), mask_size=28))


@pytest.fixture(scope="module")
def ga_run():
    model = build_detector(
        _ga_cfg(), _ga_train_cfg(),
        dict(rpn=dict(nms_pre=100, nms_post=64, max_num=64, nms_thr=0.7),
             rcnn=dict(score_thr=0.05,
                       nms=dict(type="nms", iou_threshold=0.5),
                       max_per_img=8)))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, variables


def test_ga_rpn_train_losses_and_grads(ga_run):
    model, variables = ga_run
    batch = demo_batch(0)
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        losses = model.apply({"params": p, **other}, batch,
                             method="forward_train",
                             rngs={"sampling": jax.random.PRNGKey(2)})
        return sum(jnp.sum(v) for v in losses.values()), losses

    (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    expect = {"loss_rpn_cls", "loss_rpn_bbox", "loss_rpn_shape",
              "loss_rpn_loc", "loss_cls", "loss_bbox"}
    assert set(losses) == expect
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    rp = grads["rpn_head"]
    for branch in ("conv_loc", "conv_shape", "conv_cls", "conv_reg",
                   "adaption_kernel"):
        tot = sum(float(jnp.abs(g).sum())
                  for g in jax.tree_util.tree_leaves(rp[branch]))
        assert np.isfinite(tot) and tot > 0, branch


def test_ga_rpn_simple_test(ga_run):
    model, variables = ga_run
    b, size = 2, 128
    img = jnp.asarray(np.random.RandomState(1).randn(b, size, size, 3),
                      jnp.float32)
    out = model.apply(variables, img, jnp.full((b, 2), float(size)),
                      jnp.ones((b,)), method="simple_test")
    assert out["det_bboxes"].shape == (b, 8, 4)
    assert np.isfinite(np.asarray(out["det_bboxes"])).all()
