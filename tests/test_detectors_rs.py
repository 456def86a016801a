"""DetectoRS: SAC backbone conv + RFP recursive neck (reference
``mmdet/models/backbones/detectors_resnet.py``, ``necks/rfp.py``,
mmcv ``ops/saconv.py``)."""

import numpy as np
import jax
import jax.numpy as jnp

from bonai_tpu.models import build_detector
from bonai_tpu.ops.saconv import SAConv2d


def test_saconv_starts_near_plain_conv():
    """At init (zero weight_diff / contexts, switch bias 1) SAC is a
    sigmoid(1)-weighted blend of the same standardised kernel at rates
    1 and 3 — on constant input both branches agree exactly."""
    m = SAConv2d(features=8)
    x = jnp.ones((1, 16, 16, 4))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 16, 16, 8)
    # interior response is constant (both atrous rates see the same
    # constant field)
    inner = np.asarray(out[0, 6:10, 6:10])
    assert np.allclose(inner, inner[0, 0], atol=1e-5)


def test_saconv_switch_blends_branches():
    m = SAConv2d(features=4)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 20, 20, 3),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    base = m.apply(v, x)
    # push the switch hard to the rate-1 branch
    v2 = jax.tree_util.tree_map(lambda a: a, v)
    p = dict(v2["params"])
    sw = dict(p["switch"])
    sw["bias"] = jnp.full_like(sw["bias"], 20.0)
    p["switch"] = sw
    r1_only = m.apply({"params": p}, x)
    # and to the rate-3 branch
    sw2 = dict(sw)
    sw2["bias"] = jnp.full_like(sw["bias"], -20.0)
    p2 = dict(p)
    p2["switch"] = sw2
    r3_only = m.apply({"params": p2}, x)
    # the blend sits between the two pure branches
    assert not np.allclose(np.asarray(r1_only), np.asarray(r3_only))
    lo = np.minimum(np.asarray(r1_only), np.asarray(r3_only)) - 1e-4
    hi = np.maximum(np.asarray(r1_only), np.asarray(r3_only)) + 1e-4
    b = np.asarray(base)
    assert ((b >= lo) & (b <= hi)).mean() > 0.99


MODEL = dict(
    type="FasterRCNN",
    backbone=dict(type="DetectoRS_ResNet", depth=50, base_channels=8,
                  num_stages=4, out_indices=(0, 1, 2, 3),
                  frozen_stages=-1,
                  sac=dict(type="SAC", use_deform=False),
                  stage_with_sac=(False, True, True, True),
                  output_img=True),
    neck=dict(type="RFP", in_channels=[32, 64, 128, 256],
              out_channels=16, num_outs=5, rfp_steps=2,
              aspp_out_channels=4,
              rfp_backbone=dict(type="DetectoRS_ResNet", depth=50,
                                base_channels=8, num_stages=4,
                                out_indices=(0, 1, 2, 3),
                                frozen_stages=-1, rfp_inplanes=16,
                                sac=dict(type="SAC", use_deform=False),
                                stage_with_sac=(False, True, True, True))),
    rpn_head=dict(anchor_generator=dict(scales=[8], ratios=[0.5, 1.0, 2.0],
                                        strides=[4, 8, 16, 32, 64]),
                  feat_channels=16, in_channels=16),
    roi_head=dict(
        bbox_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=7,
                           sampling_ratio=0),
            out_channels=16, featmap_strides=[4, 8, 16, 32]),
        bbox_head=dict(type="Shared2FCBBoxHead", in_channels=16,
                       fc_out_channels=32, num_classes=1)))
TRAIN_CFG = dict(
    rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                           min_pos_iou=0.3),
             sampler=dict(num=64, pos_fraction=0.5)),
    rpn_proposal=dict(nms_pre=100, max_num=40, nms_thr=0.7),
    rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                            min_pos_iou=0.5, match_low_quality=False),
              sampler=dict(num=32, pos_fraction=0.25)))
TEST_CFG = dict(
    rpn=dict(nms_pre=100, max_num=40, nms_thr=0.7),
    rcnn=dict(score_thr=0.05, nms=dict(type="nms", iou_threshold=0.5),
              max_per_img=10))


def test_detectors_faster_rcnn_train_and_test():
    m = build_detector(MODEL, TRAIN_CFG, TEST_CFG)
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
    v = m.init({"params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1)}, batch,
               method="forward_train")
    np_ = v["params"]["neck"]
    assert "rfp_backbone1" in np_ and "rfp_weight" in np_
    # SAC in stage-2+ blocks of both backbones
    assert "weight_diff" in v["params"]["backbone"]["layer2_0"]["conv2"]
    # RFP injection conv exists on the recursive backbone only
    assert "rfp_conv" in np_["rfp_backbone1"]["layer2_0"]

    def total(params):
        losses = m.apply(
            {"params": params, "batch_stats": v.get("batch_stats", {})},
            batch, method="forward_train",
            rngs={"sampling": jax.random.PRNGKey(2)})
        return sum(jnp.asarray(x, jnp.float32)
                   for k, x in losses.items() if k.startswith("loss"))

    val, grads = jax.value_and_grad(total)(v["params"])
    assert np.isfinite(float(val)) and float(val) > 0
    gn = float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                            for x in jax.tree_util.tree_leaves(
                                grads["neck"]))))
    assert np.isfinite(gn) and gn > 0

    out = m.apply({"params": v["params"],
                   "batch_stats": v.get("batch_stats", {})},
                  batch["image"], batch["img_shape"], jnp.ones((2,)),
                  method="simple_test")
    assert out["det_bboxes"].shape == (2, 10, 4)
    assert np.isfinite(np.asarray(out["det_bboxes"])).all()
