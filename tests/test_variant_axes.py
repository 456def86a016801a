"""Variant-axis code paths behind the round-5 config-tree deepening:
FCOS center-sampling / norm_on_bbox / GIoU / dcn-on-last-conv, RepPoints
minmax / partial_minmax / grid-points, DCNv1 + deform_groups, and the
dpool / mdpool RoI layers (reference configs/{fcos,reppoints,dcn}/)."""

import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))


# ---------------- FCOS axes ----------------

def _fcos_model(**head_kw):
    from bonai_tpu.models import build_detector
    cfg = dict(
        type="FCOS",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1, num_outs=5,
                  add_extra_convs="on_output",
                  relu_before_extra_convs=True),
        bbox_head=dict(type="FCOSHead", num_classes=3, in_channels=32,
                       feat_channels=32, stacked_convs=1,
                       strides=[8, 16, 32, 64, 128], **head_kw))
    return build_detector(
        cfg,
        dict(assigner=None),
        dict(nms_pre=100, score_thr=0.05,
             nms=dict(type="nms", iou_threshold=0.5), max_per_img=10))


def _batch(rng, size=64, g=4):
    xy1 = rng.uniform(0, size * 0.5, (2, g, 2)).astype(np.float32)
    wh = rng.uniform(8, size * 0.4, (2, g, 2)).astype(np.float32)
    return {
        "image": jnp.asarray(rng.randn(2, size, size, 3), jnp.float32),
        "img_shape": jnp.full((2, 2), float(size)),
        "gt_bboxes": jnp.asarray(
            np.concatenate([xy1, np.minimum(xy1 + wh, size - 1)], -1)),
        "gt_labels": jnp.asarray(rng.randint(0, 3, (2, g)), jnp.int32),
        "gt_valid": jnp.ones((2, g), bool),
    }


@pytest.mark.parametrize("head_kw", [
    dict(center_sampling=True, center_sample_radius=1.5),
    dict(norm_on_bbox=True, centerness_on_reg=True,
         loss_bbox=dict(type="GIoULoss", loss_weight=1.0)),
    dict(dcn_on_last_conv=True),
])
def test_fcos_variant_axes_train_and_test(head_kw):
    model = _fcos_model(**head_kw)
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch["image"])
    losses = model.apply(variables, batch, method="forward_train")
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, head_kw)
    out = model.apply(variables, batch["image"], batch["img_shape"],
                      jnp.ones((2,)), method="simple_test")
    assert np.isfinite(np.asarray(out["det_bboxes"])).all()


def test_fcos_center_sampling_shrinks_positives():
    from bonai_tpu.models.dense_heads.fcos_head import fcos_targets
    pts = jnp.asarray(np.mgrid[4:64:8, 4:64:8].reshape(2, -1).T[:, ::-1],
                      jnp.float32)
    ranges = jnp.tile(jnp.asarray([[-1.0, 1e8]]), (pts.shape[0], 1))
    strides = jnp.full((pts.shape[0],), 8.0)
    gt = jnp.asarray([[4.0, 4.0, 60.0, 60.0]])
    valid = jnp.ones((1,), bool)
    labels = jnp.zeros((1,), jnp.int32)
    l_all, _, _ = fcos_targets(pts, ranges, gt, valid, labels, 1)
    l_cs, _, _ = fcos_targets(pts, ranges, gt, valid, labels, 1,
                              strides_pt=strides, center_sample_radius=1.5)
    n_all = int(jnp.sum(l_all == 0))
    n_cs = int(jnp.sum(l_cs == 0))
    assert 0 < n_cs < n_all


# ---------------- RepPoints axes ----------------

def test_points2bbox_transforms():
    from bonai_tpu.models.dense_heads.reppoints_head import points2bbox
    pts = jnp.asarray(np.random.RandomState(0).randn(9, 2), jnp.float32)
    mm = points2bbox(pts, method="minmax")
    assert np.allclose(mm[:2], np.asarray(pts).min(0))
    assert np.allclose(mm[2:], np.asarray(pts).max(0))
    pm = points2bbox(pts, method="partial_minmax")
    assert np.allclose(pm[:2], np.asarray(pts)[:4].min(0))
    mo = points2bbox(pts, jnp.zeros((2,)), method="moment")
    assert mo.shape == (4,)
    with pytest.raises(KeyError):
        points2bbox(pts, method="bogus")


def _reppoints_model(**head_kw):
    from bonai_tpu.models import build_detector
    cfg = dict(
        type="RepPointsDetector",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1, num_outs=5,
                  add_extra_convs="on_input"),
        bbox_head=dict(type="RepPointsHead", num_classes=2,
                       in_channels=32, feat_channels=32,
                       point_feat_channels=32, stacked_convs=1,
                       num_points=9, **head_kw))
    return build_detector(
        cfg,
        dict(init=dict(assigner=dict(type="PointAssigner", scale=4,
                                     pos_num=1)),
             refine=dict(assigner=dict(pos_iou_thr=0.5,
                                       neg_iou_thr=0.4))),
        dict(nms_pre=100, score_thr=0.05,
             nms=dict(type="nms", iou_threshold=0.5), max_per_img=10))


@pytest.mark.parametrize("head_kw", [
    dict(transform_method="minmax"),
    dict(transform_method="partial_minmax"),
    dict(transform_method="minmax", use_grid_points=True),
    dict(transform_method="moment", center_init=False),
])
def test_reppoints_variant_axes(head_kw):
    model = _reppoints_model(**head_kw)
    rng = np.random.RandomState(1)
    batch = _batch(rng)
    batch["gt_labels"] = jnp.clip(batch["gt_labels"], 0, 1)
    variables = model.init(jax.random.PRNGKey(0), batch["image"])
    losses = model.apply(variables, batch, method="forward_train")
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, head_kw)
    out = model.apply(variables, batch["image"], batch["img_shape"],
                      jnp.ones((2,)), method="simple_test")
    assert np.isfinite(np.asarray(out["det_bboxes"])).all()


# ---------------- DCN v1 + deform groups ----------------

def test_deform_groups_matches_groupwise_reference():
    from bonai_tpu.ops.deform_conv import deform_conv2d
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    kern = jnp.asarray(rng.randn(3, 3, 4, 6), jnp.float32)
    off = jnp.asarray(rng.randn(1, 8, 8, 2 * 9 * 2) * 0.3, jnp.float32)
    out = deform_conv2d(x, off, kern, deform_groups=2)
    # groupwise reference: sample each half with its own offsets using
    # the ungrouped op and half-kernels, then sum the contributions
    ref = 0
    for g in range(2):
        xg = x[..., 2 * g:2 * g + 2]
        kg = kern[:, :, 2 * g:2 * g + 2, :]
        og = off[..., 18 * g:18 * (g + 1)]
        ref = ref + deform_conv2d(xg, og, kg, deform_groups=1)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_dcn_v1_and_group4_backbone_builds():
    from bonai_tpu.models import build_detector
    for dcn in (dict(type="DCN", deform_groups=1,
                     fallback_on_stride=False),
                dict(type="DCNv2", deform_groups=4,
                     fallback_on_stride=False)):
        cfg = dict(
            type="FasterRCNN",
            backbone=dict(type="ResNet", depth=50,
                          out_indices=(0, 1, 2, 3), dcn=dcn,
                          stage_with_dcn=(False, True, True, True)),
            neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
                      out_channels=32, num_outs=5),
            rpn_head=dict(type="RPNHead", in_channels=32,
                          feat_channels=32,
                          anchor_generator=dict(
                              scales=[8], ratios=[0.5, 1.0, 2.0],
                              strides=[4, 8, 16, 32, 64])),
            roi_head=dict(
                type="StandardRoIHead",
                bbox_roi_extractor=dict(
                    roi_layer=dict(output_size=7, sampling_ratio=2),
                    out_channels=32, featmap_strides=[4, 8, 16, 32]),
                bbox_head=dict(num_classes=1, in_channels=32,
                               fc_out_channels=32,
                               bbox_coder=dict(
                                   target_means=[0.0] * 4,
                                   target_stds=[0.1, 0.1, 0.2, 0.2]))))
        model = build_detector(cfg, None, None)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)))
        p = shapes["params"]["backbone"]
        conv_off = [k for k in str(p) .split("'")
                    if "conv_offset" in k]
        # DCNv1 offset conv: 2*9*g channels; v2: 3*9*g
        layer = p["layer2_0"]["conv2"]["conv_offset"]["kernel"]
        want = (2 * 9 * dcn["deform_groups"]
                if dcn["type"] == "DCN"
                else 3 * 9 * dcn["deform_groups"])
        assert layer.shape[-1] == want, (dcn, layer.shape)


# ---------------- dpool / mdpool RoI layers ----------------

@pytest.mark.parametrize("lt", ["DeformRoIPoolPack",
                                "ModulatedDeformRoIPoolPack"])
def test_dpool_extractor_forward(lt):
    from bonai_tpu.models import build_detector
    cfg = dict(
        type="FasterRCNN",
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      anchor_generator=dict(
                          scales=[8], ratios=[0.5, 1.0, 2.0],
                          strides=[4, 8, 16, 32, 64])),
        roi_head=dict(
            type="StandardRoIHead",
            bbox_roi_extractor=dict(
                type="SingleRoIExtractor",
                roi_layer=dict(type=lt, output_size=7,
                               output_channels=32,
                               deform_fc_channels=64),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(num_classes=1, in_channels=32,
                           fc_out_channels=32,
                           bbox_coder=dict(
                               target_means=[0.0] * 4,
                               target_stds=[0.1, 0.1, 0.2, 0.2]))))
    model = build_detector(
        cfg,
        dict(rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                    min_pos_iou=0.3),
                      sampler=dict(num=16, pos_fraction=0.5)),
             rpn_proposal=dict(nms_pre=50, nms_post=16, max_num=16,
                               nms_thr=0.7),
             rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                     min_pos_iou=0.5),
                       sampler=dict(num=16, pos_fraction=0.25))),
        dict(rpn=dict(nms_pre=50, nms_post=16, max_num=16, nms_thr=0.7),
             rcnn=dict(score_thr=0.05,
                       nms=dict(type="nms", iou_threshold=0.5),
                       max_per_img=8)))
    rng = np.random.RandomState(3)
    batch = _batch(rng)
    batch["gt_labels"] = jnp.zeros_like(batch["gt_labels"])
    variables = model.init(jax.random.PRNGKey(0), batch["image"])
    assert any("dpool" in k for k in variables["params"]), \
        list(variables["params"])
    losses = model.apply(variables, batch, method="forward_train",
                         rngs={"sampling": jax.random.PRNGKey(1)})
    for k, v in losses.items():
        assert np.isfinite(float(np.sum(np.asarray(v)))), (k, lt)


# ---------------- PISA-SSD loss ----------------

def test_pisa_ssd_loss_isr_carl():
    from bonai_tpu.models.dense_heads.ssd_head import ssd_loss
    rng = np.random.RandomState(4)
    b, num_classes = 2, 3
    # two tiny "levels"
    cls_scores = [jnp.asarray(rng.randn(b, 4, 4, (num_classes + 1) * 1),
                              jnp.float32),
                  jnp.asarray(rng.randn(b, 2, 2, (num_classes + 1) * 1),
                              jnp.float32)]
    bbox_preds = [jnp.asarray(rng.randn(b, 4, 4, 4) * 0.1, jnp.float32),
                  jnp.asarray(rng.randn(b, 2, 2, 4) * 0.1, jnp.float32)]
    # anchors roughly tiling a 64x64 image
    anchors = []
    for n, s in ((4, 16), (2, 32)):
        ys, xs = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        cx = (xs.ravel() + 0.5) * s
        cy = (ys.ravel() + 0.5) * s
        anchors.append(np.stack([cx - s, cy - s, cx + s, cy + s], -1))
    anchors_flat = jnp.asarray(np.concatenate(anchors, 0), jnp.float32)
    gt = jnp.asarray([[[4.0, 4.0, 40.0, 40.0], [20.0, 20.0, 60.0, 60.0]]
                      ] * b)
    gv = jnp.ones((b, 2), bool)
    gl = jnp.asarray([[0, 1]] * b, jnp.int32)
    acfg = dict(assigner=dict(pos_iou_thr=0.2, neg_iou_thr=0.2))
    base = ssd_loss(cls_scores, bbox_preds, anchors_flat, gt, gv, gl,
                    num_classes, acfg)
    pisa = ssd_loss(cls_scores, bbox_preds, anchors_flat, gt, gv, gl,
                    num_classes, acfg,
                    pisa_cfg=dict(isr=dict(k=2.0, bias=0.0),
                                  carl=dict(k=1.0, bias=0.2,
                                            loss_weight=1.0)))
    assert "loss_carl" in pisa and np.isfinite(float(pisa["loss_carl"]))
    for k in ("loss_cls", "loss_bbox"):
        assert np.isfinite(float(pisa[k]))
    # the ISR-P normalisation preserves the weighted positive cls-loss
    # SUM (reference pisa_loss.py:101-108), so the scalar matches the
    # base run; the reweighting itself must show up in the gradients
    assert abs(float(pisa["loss_cls"]) - float(base["loss_cls"])) < 1e-3

    def cls_loss(scores):
        out = ssd_loss([scores, cls_scores[1]], bbox_preds, anchors_flat,
                       gt, gv, gl, num_classes, acfg,
                       pisa_cfg=dict(isr=dict(k=2.0, bias=0.0)))
        return out["loss_cls"]

    import jax
    g_pisa = jax.grad(cls_loss)(cls_scores[0])
    g_base = jax.grad(lambda s: ssd_loss(
        [s, cls_scores[1]], bbox_preds, anchors_flat, gt, gv, gl,
        num_classes, acfg)["loss_cls"])(cls_scores[0])
    assert not np.allclose(np.asarray(g_pisa), np.asarray(g_base),
                           atol=1e-7)
