"""Grid R-CNN: grid-point heatmap localisation (reference
``mmdet/models/roi_heads/grid_roi_head.py`` + ``mask_heads/grid_head.py``,
``detectors/grid_rcnn.py``)."""

import numpy as np
import jax
import jax.numpy as jnp

from bonai_tpu.models import build_detector
from bonai_tpu.models.roi_heads.grid_head import (
    grid_decode_boxes, grid_factors_np, grid_targets, sub_regions_np)


MODEL = dict(
    type="GridRCNN",
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
                       fc_out_channels=32, num_classes=1, with_reg=False),
        grid_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=14,
                           sampling_ratio=0),
            out_channels=16, featmap_strides=[4, 8, 16, 32]),
        grid_head=dict(grid_points=9, num_convs=2, in_channels=16,
                       point_feat_channels=8,
                       loss_grid=dict(loss_weight=15))))
TRAIN_CFG = dict(
    rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                           min_pos_iou=0.3),
             sampler=dict(num=64, pos_fraction=0.5)),
    rpn_proposal=dict(nms_pre=100, max_num=40, nms_thr=0.7),
    rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                            min_pos_iou=0.5, match_low_quality=False),
              sampler=dict(num=32, pos_fraction=0.25),
              pos_radius=1))
TEST_CFG = dict(
    rpn=dict(nms_pre=100, max_num=40, nms_thr=0.7),
    rcnn=dict(score_thr=0.03, nms=dict(type="nms", iou_threshold=0.3),
              max_per_img=10))


def _batch(b=2, g=3, size=64, seed=0):
    r = np.random.RandomState(seed)
    xy1 = r.uniform(0, size * 0.4, (b, g, 2)).astype(np.float32)
    wh = r.uniform(12, size * 0.4, (b, g, 2)).astype(np.float32)
    return dict(
        image=jnp.asarray(r.randn(b, size, size, 3), jnp.float32),
        img_shape=jnp.full((b, 2), float(size)),
        gt_bboxes=jnp.asarray(
            np.concatenate([xy1, np.minimum(xy1 + wh, size - 1)], -1)),
        gt_labels=jnp.zeros((b, g), jnp.int32),
        gt_valid=jnp.ones((b, g), bool))


def test_sub_regions_and_factors_reference_layout():
    """Hand math for the 3x3 lattice (reference ``calc_sub_regions`` /
    target factors, x-major point index)."""
    sub = sub_regions_np(9, 56)                  # half = 28
    # corner point 0 (x_idx 0, y_idx 0) -> origin (0, 0); centre point 4
    # (x_idx 1, y_idx 1) -> ((0.5-0.25)*56, same) = (14, 14); last ->
    # (28, 28)
    assert tuple(sub[0]) == (0, 0)
    assert tuple(sub[4]) == (14, 14)
    assert tuple(sub[8]) == (28, 28)
    fac = grid_factors_np(9)
    assert np.allclose(fac[0], [1.0, 1.0])       # x1, y1 corner
    assert np.allclose(fac[4], [0.5, 0.5])       # centre
    assert np.allclose(fac[8], [0.0, 0.0])       # x2, y2 corner


def test_targets_decode_roundtrip():
    """Painting targets for gt boxes and decoding the same heatmaps must
    recover the gt box to within one heatmap cell."""
    props = jnp.asarray([[10., 10., 40., 44.], [20., 16., 52., 50.]])
    gts = jnp.asarray([[12., 11., 38., 42.], [22., 18., 50., 52.]])
    whole = 56
    tgt = grid_targets(props, gts, 9, whole, pos_radius=1)   # (P, G, h, h)
    assert tgt.shape == (2, 9, 28, 28)
    assert float(tgt.max()) == 1.0
    hm = jnp.transpose(tgt, (0, 2, 3, 1)) * 20.0 - 10.0      # logits
    dec = grid_decode_boxes(props, hm, 9, whole, (64.0, 64.0))
    # one cell of the half-sized window spans ew/whole = 2w/56 px
    cell = 2 * float(props[:, 2].max() - props[:, 0].min()) / whole
    assert np.allclose(np.asarray(dec), np.asarray(gts), atol=cell + 1.0)


def test_loss_differentiable_no_bbox_loss():
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
        assert "loss_grid" in losses
        assert "loss_bbox" not in losses         # with_reg=False
        return sum(jnp.asarray(x, jnp.float32)
                   for k, x in losses.items() if k.startswith("loss"))

    val, grads = jax.value_and_grad(total)(v["params"])
    assert np.isfinite(float(val)) and float(val) > 0
    gh = grads["grid_head"]
    gnorm = float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                               for x in jax.tree_util.tree_leaves(gh))))
    assert np.isfinite(gnorm) and gnorm > 0


def test_simple_test_refines_boxes():
    m = build_detector(MODEL, TRAIN_CFG, TEST_CFG)
    batch = _batch()
    v = m.init({"params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1)}, batch,
               method="forward_train")
    out = m.apply({"params": v["params"],
                   "batch_stats": v.get("batch_stats", {})},
                  batch["image"], batch["img_shape"],
                  jnp.ones((2,)), method="simple_test")
    assert out["det_bboxes"].shape[-1] == 4
    bb = np.asarray(out["det_bboxes"])
    assert np.isfinite(bb).all()
    # boxes stay inside the image
    assert (bb >= -1e-3).all() and (bb <= 64 + 1e-3).all()


def test_init_via_forward_dummy_covers_grid_head():
    """Same init-path regression as PointRend: forward_dummy must touch
    the grid head."""
    m = build_detector(MODEL, TRAIN_CFG, TEST_CFG)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert "grid_head" in v["params"]
    batch = _batch()
    losses = m.apply(v, batch, method="forward_train",
                     rngs={"sampling": jax.random.PRNGKey(2)})
    assert "loss_grid" in losses
