"""RPN-only and Fast R-CNN detectors (reference
``mmdet/models/detectors/rpn.py`` and ``fast_rcnn.py``)."""

import numpy as np
import jax
import jax.numpy as jnp

from bonai_tpu.models import build_detector


BACKBONE = dict(type="ResNet", depth=18, base_channels=8)
NECK = dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=16,
            num_outs=5)
RPN_HEAD = dict(anchor_generator=dict(scales=[8], ratios=[0.5, 1.0, 2.0],
                                      strides=[4, 8, 16, 32, 64]),
                feat_channels=16, in_channels=16)


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


def test_rpn_only_train_and_test():
    m = build_detector(
        dict(type="RPN", backbone=BACKBONE, neck=NECK, rpn_head=RPN_HEAD,
             roi_head=None),
        dict(rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                    min_pos_iou=0.3),
                      sampler=dict(num=64, pos_fraction=0.5)),
             rpn_proposal=dict(nms_pre=100, max_num=40, nms_thr=0.7)),
        dict(rpn=dict(nms_pre=100, max_num=40, nms_thr=0.7)))
    batch = _batch()
    v = m.init({"params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1)}, batch,
               method="forward_train")

    def total(params):
        losses = m.apply(
            {"params": params, "batch_stats": v.get("batch_stats", {})},
            batch, method="forward_train",
            rngs={"sampling": jax.random.PRNGKey(2)})
        assert set(losses) == {"loss_rpn_cls", "loss_rpn_bbox"}
        return sum(jnp.asarray(x, jnp.float32) for x in losses.values())

    val, grads = jax.value_and_grad(total)(v["params"])
    assert np.isfinite(float(val)) and float(val) > 0
    gnorm = float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                               for x in jax.tree_util.tree_leaves(grads))))
    assert gnorm > 0
    out = m.apply({"params": v["params"],
                   "batch_stats": v.get("batch_stats", {})},
                  batch["image"], batch["img_shape"], jnp.ones((2,)),
                  method="simple_test")
    assert out["det_bboxes"].shape == (2, 40, 4)
    assert np.isfinite(np.asarray(out["det_bboxes"])).all()


def test_fast_rcnn_precomputed_proposals():
    m = build_detector(
        dict(type="FastRCNN", backbone=BACKBONE, neck=NECK,
             rpn_head=RPN_HEAD,     # module built but unused in loss
             roi_head=dict(
                 bbox_roi_extractor=dict(
                     roi_layer=dict(type="RoIAlign", output_size=7,
                                    sampling_ratio=0),
                     out_channels=16, featmap_strides=[4, 8, 16, 32]),
                 bbox_head=dict(type="Shared2FCBBoxHead", in_channels=16,
                                fc_out_channels=32, num_classes=1))),
        dict(rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                     min_pos_iou=0.5,
                                     match_low_quality=False),
                       sampler=dict(num=32, pos_fraction=0.25))),
        dict(rcnn=dict(score_thr=0.05,
                       nms=dict(type="nms", iou_threshold=0.5),
                       max_per_img=10)))
    batch = _batch()
    r = np.random.RandomState(7)
    props = np.concatenate(
        [r.uniform(0, 30, (2, 20, 2)), r.uniform(32, 63, (2, 20, 2))],
        -1).astype(np.float32)
    batch["proposals"] = jnp.asarray(props)
    batch["proposals_valid"] = jnp.ones((2, 20), bool)
    v = m.init({"params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1)}, batch,
               method="forward_train")
    losses = m.apply(v, batch, method="forward_train",
                     rngs={"sampling": jax.random.PRNGKey(2)})
    assert "loss_cls" in losses and "loss_bbox" in losses
    assert "loss_rpn_cls" not in losses
    out = m.apply(v, batch["image"], batch["img_shape"], jnp.ones((2,)),
                  batch["proposals"], batch["proposals_valid"],
                  method="simple_test")
    assert out["det_bboxes"].shape == (2, 10, 4)
    assert np.isfinite(np.asarray(out["det_bboxes"])).all()


def test_libra_bfp_and_balanced_l1():
    """BFP chained neck + BalancedL1 reg dispatch (Libra R-CNN,
    reference configs/libra_rcnn)."""
    m = build_detector(
        dict(type="FasterRCNN", backbone=BACKBONE,
             neck=[dict(type="FPN", in_channels=[8, 16, 32, 64],
                        out_channels=16, num_outs=5),
                   dict(type="BFP", in_channels=16, num_levels=5,
                        refine_level=2, refine_type="non_local")],
             rpn_head=RPN_HEAD,
             roi_head=dict(
                 bbox_roi_extractor=dict(
                     roi_layer=dict(type="RoIAlign", output_size=7,
                                    sampling_ratio=0),
                     out_channels=16, featmap_strides=[4, 8, 16, 32]),
                 bbox_head=dict(type="Shared2FCBBoxHead", in_channels=16,
                                fc_out_channels=32, num_classes=1,
                                loss_bbox=dict(type="BalancedL1Loss",
                                               alpha=0.5, gamma=1.5,
                                               beta=1.0,
                                               loss_weight=1.0)))),
        dict(rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                    min_pos_iou=0.3),
                      sampler=dict(num=64, pos_fraction=0.5)),
             rpn_proposal=dict(nms_pre=100, max_num=40, nms_thr=0.7),
             rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                     min_pos_iou=0.5,
                                     match_low_quality=False),
                       sampler=dict(type="IoUBalancedNegSampler", num=32,
                                    pos_fraction=0.25, num_bins=3))),
        dict(rpn=dict(nms_pre=100, max_num=40, nms_thr=0.7),
             rcnn=dict(score_thr=0.05,
                       nms=dict(type="nms", iou_threshold=0.5),
                       max_per_img=10)))
    batch = _batch()
    v = m.init({"params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1)}, batch,
               method="forward_train")
    assert "neck_extra0" in v["params"]          # BFP non-local params

    def total(params):
        losses = m.apply(
            {"params": params, "batch_stats": v.get("batch_stats", {})},
            batch, method="forward_train",
            rngs={"sampling": jax.random.PRNGKey(2)})
        return sum(jnp.asarray(x, jnp.float32)
                   for k, x in losses.items() if k.startswith("loss"))

    val, grads = jax.value_and_grad(total)(v["params"])
    assert np.isfinite(float(val)) and float(val) > 0
    g = grads["neck_extra0"]
    gn = float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                            for x in jax.tree_util.tree_leaves(g))))
    assert np.isfinite(gn)


def test_nasfpn_retinanet():
    """NAS-FPN stacked merge cells under RetinaNet (reference
    configs/nas_fpn)."""
    m = build_detector(
        dict(type="RetinaNet", backbone=BACKBONE,
             neck=dict(type="NASFPN", in_channels=[16, 32, 64],
                       out_channels=16, num_outs=5, stack_times=2,
                       start_level=0),
             bbox_head=dict(num_classes=1, in_channels=16,
                            feat_channels=16,
                            anchor_generator=dict(
                                octave_base_scale=4, scales_per_octave=3,
                                ratios=[0.5, 1.0, 2.0],
                                strides=[8, 16, 32, 64, 128]))),
        dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.4,
                           min_pos_iou=0.0)),
        dict(nms_pre=100, score_thr=0.05,
             nms=dict(type="nms", iou_threshold=0.5), max_per_img=10))
    batch = _batch()
    v = m.init({"params": jax.random.PRNGKey(0)}, batch,
               method="forward_train")
    assert "s1_gp_75_6" in v["params"]["neck"]

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
                                grads["neck"]))))
    assert np.isfinite(gn) and gn > 0


def test_retinanet_ghm_losses():
    """GHM-C / GHM-R dispatch in the retina loss (reference
    configs/ghm)."""
    m = build_detector(
        dict(type="RetinaNet", backbone=BACKBONE,
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, num_outs=5, start_level=1),
             bbox_head=dict(num_classes=1, in_channels=16,
                            feat_channels=16,
                            anchor_generator=dict(
                                octave_base_scale=4, scales_per_octave=3,
                                ratios=[0.5, 1.0, 2.0],
                                strides=[8, 16, 32, 64, 128]),
                            loss_cls=dict(type="GHMC", bins=10,
                                          use_sigmoid=True,
                                          loss_weight=1.0),
                            loss_bbox=dict(type="GHMR", mu=0.02, bins=10,
                                           loss_weight=10.0))),
        dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.4,
                           min_pos_iou=0.0)),
        dict(nms_pre=100, score_thr=0.05,
             nms=dict(type="nms", iou_threshold=0.5), max_per_img=10))
    batch = _batch()
    v = m.init({"params": jax.random.PRNGKey(0)}, batch,
               method="forward_train")

    def total(params):
        losses = m.apply(
            {"params": params, "batch_stats": v.get("batch_stats", {})},
            batch, method="forward_train")
        return sum(jnp.asarray(x, jnp.float32) for x in losses.values())

    val, grads = jax.value_and_grad(total)(v["params"])
    assert np.isfinite(float(val)) and float(val) > 0
    gn = float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                            for x in jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(gn) and gn > 0


def test_pisa_retinanet():
    """ISR-P + CARL on the retina loss (reference
    pisa_retinanet_head.py)."""
    m = build_detector(
        dict(type="RetinaNet", backbone=BACKBONE,
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, num_outs=5, start_level=1),
             bbox_head=dict(num_classes=1, in_channels=16,
                            feat_channels=16,
                            anchor_generator=dict(
                                octave_base_scale=4, scales_per_octave=3,
                                ratios=[0.5, 1.0, 2.0],
                                strides=[8, 16, 32, 64, 128]))),
        dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.4,
                           min_pos_iou=0.0),
             isr=dict(k=2.0, bias=0.0),
             carl=dict(k=1.0, bias=0.2, loss_weight=5.0)),
        dict(nms_pre=100, score_thr=0.05,
             nms=dict(type="nms", iou_threshold=0.5), max_per_img=10))
    batch = _batch()
    v = m.init({"params": jax.random.PRNGKey(0)}, batch,
               method="forward_train")

    def total(params):
        losses = m.apply(
            {"params": params, "batch_stats": v.get("batch_stats", {})},
            batch, method="forward_train")
        assert "loss_carl" in losses
        return sum(jnp.asarray(x, jnp.float32) for x in losses.values())

    val, grads = jax.value_and_grad(total)(v["params"])
    assert np.isfinite(float(val)) and float(val) > 0
    gn = float(jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                            for x in jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(gn) and gn > 0
