"""PointRend: coarse mask + uncertainty point refinement (reference
``mmdet/models/roi_heads/point_rend_roi_head.py``, ``mask_point_head.py``,
``coarse_mask_head.py``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonai_tpu.models import build_detector
from bonai_tpu.models.roi_heads.point_head import (
    bilinear_point_sample, fine_grained_point_feats,
    point_targets_from_instance_masks, uncertainty_points_test,
    uncertainty_points_train)


MODEL = dict(
    type="PointRend",
    backbone=dict(type="ResNet", depth=18, base_channels=8),
    neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=16,
              num_outs=5),
    rpn_head=dict(anchor_generator=dict(scales=[8], ratios=[0.5, 1.0, 2.0],
                                        strides=[4, 8, 16, 32, 64]),
                  feat_channels=16, in_channels=16),
    roi_head=dict(
        bbox_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=7,
                           sampling_ratio=0),
            out_channels=16, featmap_strides=[4, 8, 16, 32]),
        bbox_head=dict(type="Shared2FCBBoxHead", in_channels=16,
                       fc_out_channels=32, num_classes=1),
        mask_roi_extractor=dict(
            roi_layer=dict(type="SimpleRoIAlign", output_size=14,
                           sampling_ratio=0),
            out_channels=16, featmap_strides=[4]),
        mask_head=dict(type="CoarseMaskHead", num_convs=0, num_fcs=2,
                       in_channels=16, conv_out_channels=16,
                       fc_out_channels=32, roi_feat_size=14,
                       num_classes=1),
        point_head=dict(num_fcs=3, in_channels=16, fc_channels=16,
                        num_classes=1)))
TRAIN_CFG = dict(
    rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                           min_pos_iou=0.3),
             sampler=dict(num=64, pos_fraction=0.5)),
    rpn_proposal=dict(nms_pre=100, max_num=40, nms_thr=0.7),
    rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                            min_pos_iou=0.5, match_low_quality=False),
              sampler=dict(num=32, pos_fraction=0.25),
              mask_size=7, num_points=32, oversample_ratio=3,
              importance_sample_ratio=0.75))
TEST_CFG = dict(
    rpn=dict(nms_pre=100, max_num=40, nms_thr=0.7),
    rcnn=dict(score_thr=0.05, nms=dict(type="nms", iou_threshold=0.5),
              max_per_img=8, subdivision_steps=2,
              subdivision_num_points=64, scale_factor=2))


def _batch(b=2, g=3, size=64, seed=0, mask_m=16):
    r = np.random.RandomState(seed)
    xy1 = r.uniform(0, size * 0.4, (b, g, 2)).astype(np.float32)
    wh = r.uniform(12, size * 0.4, (b, g, 2)).astype(np.float32)
    masks = (r.rand(b, g, mask_m, mask_m) > 0.4).astype(np.float32)
    return dict(
        image=jnp.asarray(r.randn(b, size, size, 3), jnp.float32),
        img_shape=jnp.full((b, 2), float(size)),
        gt_bboxes=jnp.asarray(
            np.concatenate([xy1, np.minimum(xy1 + wh, size - 1)], -1)),
        gt_labels=jnp.zeros((b, g), jnp.int32),
        gt_masks=jnp.asarray(masks),
        gt_valid=jnp.ones((b, g), bool))


def test_bilinear_point_sample_exact():
    """At pixel centers the sample equals the pixel; zero padding outside
    (grid_sample align_corners=False semantics)."""
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    # center of pixel (row 1, col 2) -> coords (x=2, y=1) in the
    # p*size-0.5 frame means passing exactly (2.0, 1.0)
    v = bilinear_point_sample(img, jnp.asarray([[2.0, 1.0]]))
    assert float(v[0]) == pytest.approx(6.0)
    # halfway between pixels (1,1) and (1,2): mean of 5 and 6
    v = bilinear_point_sample(img, jnp.asarray([[1.5, 1.0]]))
    assert float(v[0]) == pytest.approx(5.5)
    # outside with zero padding: -0.5 is half outside -> half the value
    v = bilinear_point_sample(img, jnp.asarray([[-0.5, 1.0]]))
    assert float(v[0]) == pytest.approx(0.5 * 4.0)


def test_point_targets_match_mask_values():
    """Point at the center of an instance-local mask cell must return
    that cell's value."""
    rois = jnp.asarray([[0.0, 10.0, 10.0, 26.0, 26.0]])
    boxes = jnp.asarray([[10.0, 10.0, 26.0, 26.0]])    # gt == roi, 16px
    m = np.zeros((1, 8, 8), np.float32)
    m[0, 2, 5] = 1.0                                   # row 2, col 5
    # mask cell (5, 2) center in rel-roi coords: ((5+0.5)/8, (2+0.5)/8)
    pts = jnp.asarray([[[(5 + 0.5) / 8, (2 + 0.5) / 8],
                        [0.05, 0.05]]])
    tgt = point_targets_from_instance_masks(rois, pts, boxes,
                                            jnp.asarray(m))
    assert float(tgt[0, 0]) == pytest.approx(1.0)
    assert float(tgt[0, 1]) == pytest.approx(0.0)


def test_fine_grained_feats_constant_map():
    """On a constant feature map every sampled point returns that
    constant; batch index selects the right image."""
    feat = jnp.stack([jnp.full((8, 8, 4), 3.0), jnp.full((8, 8, 4), 7.0)])
    rois = jnp.asarray([[0.0, 4.0, 4.0, 20.0, 20.0],
                        [1.0, 4.0, 4.0, 20.0, 20.0]])
    pts = jnp.broadcast_to(jnp.asarray([[0.3, 0.6], [0.5, 0.5]]),
                           (2, 2, 2))
    out = fine_grained_point_feats(feat, rois, pts, stride=4)
    assert np.allclose(np.asarray(out[0]), 3.0)
    assert np.allclose(np.asarray(out[1]), 7.0)


def test_uncertainty_selection():
    """Train sampling keeps the most ambiguous (|logit| ~ 0) locations;
    test selection returns cell-center coords of the top-k."""
    logits = jnp.asarray(np.full((1, 8, 8), 5.0, np.float32))
    logits = logits.at[0, 3, 6].set(0.0)               # most uncertain
    idx, coords = uncertainty_points_test(logits, 4)
    assert int(idx[0, 0]) == 3 * 8 + 6
    assert np.allclose(np.asarray(coords[0, 0]),
                       [(6 + 0.5) / 8, (3 + 0.5) / 8])
    # make row 3 entirely uncertain: importance-sampled points must
    # cluster around y ~ 3.5/8
    logits2 = jnp.full((1, 8, 8), 5.0).at[0, 3, :].set(0.0)
    pts = uncertainty_points_train(jax.random.PRNGKey(0), logits2,
                                   num_points=8, oversample_ratio=3,
                                   importance_sample_ratio=0.75)
    assert pts.shape == (1, 8, 2)
    d = np.abs(np.asarray(pts[0, :6, 1]) - 3.5 / 8)
    # uniform sampling would put ~1.5 of 6 points within this window;
    # importance sampling concentrates them (3 with this seed)
    assert (d < 1.0 / 8).sum() >= 3


def test_loss_differentiable_with_point_loss():
    m = build_detector(MODEL, TRAIN_CFG, TEST_CFG)
    batch = _batch()
    v = m.init({"params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1)}, batch,
               method="forward_train")

    def total(params):
        losses = m.apply(
            {"params": params, "batch_stats": v.get("batch_stats", {})},
            batch, method="forward_train",
            rngs={"sampling": jax.random.PRNGKey(2)})
        assert "loss_point" in losses and "loss_mask" in losses
        return sum(jnp.asarray(x, jnp.float32)
                   for k, x in losses.items() if k.startswith("loss"))

    val, grads = jax.value_and_grad(total)(v["params"])
    assert np.isfinite(float(val)) and float(val) > 0
    gp = grads["point_head"]
    gnorm = float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                               for x in jax.tree_util.tree_leaves(gp))))
    assert np.isfinite(gnorm) and gnorm > 0


def test_simple_test_subdivision_output():
    m = build_detector(MODEL, TRAIN_CFG, TEST_CFG)
    batch = _batch()
    v = m.init({"params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1)}, batch,
               method="forward_train")
    out = m.apply({"params": v["params"],
                   "batch_stats": v.get("batch_stats", {})},
                  batch["image"], batch["img_shape"],
                  jnp.ones((2,)), method="simple_test")
    # 7 -> 14 -> 28 after 2 subdivision steps
    assert out["mask_probs"].shape == (2, 8, 28, 28)
    mp = np.asarray(out["mask_probs"])
    assert np.isfinite(mp).all() and (mp >= 0).all() and (mp <= 1).all()


def test_init_via_forward_dummy_covers_point_head():
    """apis/train.py initialises via __call__ (forward_dummy); the
    point head must exist in that tree (regression: 50-step TPU train
    failed with ScopeParamNotFoundError point_head/fc0)."""
    m = build_detector(MODEL, TRAIN_CFG, TEST_CFG)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert "point_head" in v["params"]
    batch = _batch()
    losses = m.apply(v, batch, method="forward_train",
                     rngs={"sampling": jax.random.PRNGKey(2)})
    assert "loss_point" in losses
