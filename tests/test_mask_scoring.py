"""Mask Scoring R-CNN (reference ``mmdet/models/roi_heads/
mask_scoring_roi_head.py`` + ``maskiou_head.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu.models import build_detector
from bonai_tpu.models.roi_heads.mask_head import mask_iou_targets

from test_models_forward import (demo_batch, tiny_loft_cfg, tiny_test_cfg,
                                 tiny_train_cfg)


def test_mask_iou_targets_hand_math():
    """Pred == gt and the instance fully inside its proposal -> IoU 1;
    pred empty -> 0; gt half outside the proposal halves the IoU."""
    s = 8
    t = jnp.ones((1, s, s))
    logits_hit = jnp.full((1, s, s), 10.0)
    box = jnp.asarray([[0.0, 0.0, 16.0, 16.0]])
    inst = jnp.ones((1, 4, 4), jnp.uint8)
    iou = mask_iou_targets(logits_hit, t, box, box, inst)
    np.testing.assert_allclose(np.asarray(iou), [1.0], atol=1e-5)
    iou0 = mask_iou_targets(jnp.full((1, s, s), -10.0), t, box, box, inst)
    np.testing.assert_allclose(np.asarray(iou0), [0.0], atol=1e-5)
    # gt box twice the proposal area -> half the gt outside
    gt_box = jnp.asarray([[0.0, 0.0, 16.0, 32.0]])
    iou_h = mask_iou_targets(logits_hit, t, box, gt_box, inst)
    np.testing.assert_allclose(np.asarray(iou_h), [0.5], atol=1e-5)


@pytest.fixture(scope="module")
def ms_run():
    cfg = tiny_loft_cfg()
    cfg["type"] = "MaskRCNN"
    cfg["roi_head"].pop("offset_head")
    cfg["roi_head"].pop("offset_roi_extractor")
    cfg["roi_head"]["mask_iou_head"] = dict(
        num_convs=1, num_fcs=1, in_channels=32, conv_out_channels=32,
        fc_out_channels=32, num_classes=1,
        loss_iou=dict(loss_weight=0.5))
    model = build_detector(cfg, tiny_train_cfg(), tiny_test_cfg())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, variables


def test_mask_scoring_train(ms_run):
    model, variables = ms_run
    losses = model.apply(variables, demo_batch(0), method="forward_train",
                         rngs={"sampling": jax.random.PRNGKey(2)})
    assert "loss_mask_iou" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_mask_scoring_test(ms_run):
    model, variables = ms_run
    b, size = 2, 128
    img = jnp.asarray(np.random.RandomState(1).randn(b, size, size, 3),
                      jnp.float32)
    out = model.apply(variables, img, jnp.full((b, 2), float(size)),
                      jnp.ones((b,)), method="simple_test")
    assert out["mask_scores"].shape == out["det_scores"].shape
    assert np.isfinite(np.asarray(out["mask_scores"])).all()


def test_double_head_train_and_test():
    """Double-Head R-CNN (reference double_roi_head.py +
    double_bbox_head.py): FC cls branch + residual conv reg branch on
    center-scaled reg RoIs."""
    cfg = tiny_loft_cfg()
    cfg["type"] = "FasterRCNN"
    for k in ("offset_head", "offset_roi_extractor", "mask_head",
              "mask_roi_extractor"):
        cfg["roi_head"].pop(k, None)
    cfg["roi_head"]["reg_roi_scale_factor"] = 1.3
    cfg["roi_head"]["bbox_head"] = dict(
        type="DoubleConvFCBBoxHead", num_classes=1, num_convs=1,
        num_fcs=1, in_channels=32, conv_out_channels=64,
        fc_out_channels=32,
        bbox_coder=dict(target_means=[0.0] * 4,
                        target_stds=[0.1, 0.1, 0.2, 0.2]))
    model = build_detector(cfg, tiny_train_cfg(), tiny_test_cfg())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    p = variables["params"]["bbox_head"]
    assert "conv_branch_0" in p and "fc_branch_0" in p
    batch = demo_batch(0)
    losses = model.apply(variables, batch, method="forward_train",
                         rngs={"sampling": jax.random.PRNGKey(2)})
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    out = model.apply(variables, batch["image"], batch["img_shape"],
                      jnp.ones((2,)), method="simple_test")
    assert np.isfinite(np.asarray(out["det_bboxes"])).all()


def test_results_to_host_mask_scores_roundtrip():
    """Device mask_scores flow through results_to_host into the
    (segms, mask_score) tuple that results2json's segm score override
    consumes (reference segm2json)."""
    from bonai_tpu.apis.test import results_to_host
    out = dict(
        det_bboxes=jnp.asarray([[[2.0, 2.0, 10.0, 10.0],
                                 [0.0, 0.0, 4.0, 4.0]]]),
        det_scores=jnp.asarray([[0.9, 0.4]]),
        det_labels=jnp.zeros((1, 2), jnp.int32),
        det_valid=jnp.asarray([[True, True]]),
        mask_probs=jnp.ones((1, 2, 8, 8)) * 0.9,
        mask_scores=jnp.asarray([[0.7, 0.2]]),
    )
    res = results_to_host(out, [dict(ori_shape=(16, 16))],
                          with_offset=False)
    bbox_results, seg = res[0]
    segms, mask_score = seg
    assert len(segms[0]) == 2
    np.testing.assert_allclose(mask_score[0], [0.7, 0.2])
