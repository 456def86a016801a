"""Forward smoke tests (the analog of reference tests/test_forward.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu import Config
from bonai_tpu.models import build_detector


def tiny_loft_cfg():
    return dict(
        type="LOFT",
        backbone=dict(type="ResNet", depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, num_outs=5),
        rpn_head=dict(
            type="RPNHead", in_channels=32, feat_channels=32,
            anchor_generator=dict(scales=[8], ratios=[0.5, 1.0, 2.0],
                                  strides=[4, 8, 16, 32, 64])),
        roi_head=dict(
            type="LoftRoIHead",
            bbox_roi_extractor=dict(
                roi_layer=dict(output_size=7, sampling_ratio=2),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(num_classes=1, in_channels=32,
                           fc_out_channels=64,
                           bbox_coder=dict(target_means=[0.] * 4,
                                           target_stds=[0.1, 0.1, 0.2, 0.2])),
            mask_roi_extractor=dict(
                roi_layer=dict(output_size=14, sampling_ratio=2),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            mask_head=dict(num_convs=2, in_channels=32,
                           conv_out_channels=32, num_classes=1),
            offset_roi_extractor=dict(
                roi_layer=dict(output_size=7, sampling_ratio=2),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            offset_head=dict(type="OffsetHeadExpandFeature",
                             expand_feature_num=4, share_expand_fc=True,
                             rotations=[0, 90, 180, 270], num_convs=2,
                             num_fcs=2, in_channels=32,
                             conv_out_channels=32, fc_out_channels=64,
                             loss_offset=dict(type="SmoothL1Loss",
                                              loss_weight=16.0))),
    )


def tiny_train_cfg():
    return dict(
        rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                               min_pos_iou=0.3, match_low_quality=True),
                 sampler=dict(num=64, pos_fraction=0.5)),
        rpn_proposal=dict(nms_pre=200, nms_post=128, max_num=128,
                          nms_thr=0.7, min_bbox_size=0),
        rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                min_pos_iou=0.5, match_low_quality=True),
                  sampler=dict(num=64, pos_fraction=0.25),
                  mask_size=28))


def tiny_test_cfg():
    return dict(
        rpn=dict(nms_pre=200, nms_post=128, max_num=128, nms_thr=0.7),
        rcnn=dict(score_thr=0.05,
                  nms=dict(type="soft_nms", iou_threshold=0.5),
                  max_per_img=16, mask_thr_binary=0.5))


def demo_batch(rng, b=2, size=128, g=8, m=28):
    r = np.random.RandomState(rng)
    img = r.randn(b, size, size, 3).astype(np.float32)
    xy1 = r.uniform(0, size * 0.6, (b, g, 2))
    wh = r.uniform(8, size * 0.3, (b, g, 2))
    boxes = np.concatenate([xy1, np.minimum(xy1 + wh, size - 1)], -1)
    valid = np.ones((b, g), bool)
    valid[:, g - 2:] = False   # some padded gts
    masks = (r.rand(b, g, m, m) > 0.4).astype(np.uint8)
    offsets = r.uniform(-20, 20, (b, g, 2)).astype(np.float32)
    return {
        "image": jnp.asarray(img),
        "img_shape": jnp.full((b, 2), float(size)),
        "gt_bboxes": jnp.asarray(boxes, jnp.float32),
        "gt_labels": jnp.zeros((b, g), jnp.int32),
        "gt_valid": jnp.asarray(valid),
        "gt_masks": jnp.asarray(masks),
        "gt_offsets": jnp.asarray(offsets),
    }


@pytest.fixture(scope="module")
def tiny_loft_run():
    """One compiled value_and_grad pass shared by all assertions below
    (compile on 1 CPU core is the dominant test cost)."""
    model = build_detector(tiny_loft_cfg(), tiny_train_cfg(),
                           tiny_test_cfg())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
    batch = demo_batch(0)
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    @jax.jit
    def run(p, batch):
        def loss_fn(p):
            losses = model.apply({"params": p, **other}, batch,
                                 method="forward_train",
                                 rngs={"sampling": jax.random.PRNGKey(2)})
            return sum(jnp.sum(v) for v in losses.values()), losses
        return jax.value_and_grad(loss_fn, has_aux=True)(p)

    (_, losses), grads = run(params, batch)
    return model, variables, losses, grads, run, params


def test_loft_zero_gt_batch_is_finite(tiny_loft_run):
    """All-padded GT must not produce NaNs (reference empty-GT handling
    via _rand_another is a data-side retry; the compiled step must still
    be safe when a shard sees no positives)."""
    model, variables, _, _, run, params = tiny_loft_run
    batch = demo_batch(3)
    batch = dict(batch)
    batch["gt_valid"] = jnp.zeros_like(batch["gt_valid"])
    (_, losses), grads = run(params, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm)


def test_loft_forward_train_losses(tiny_loft_run):
    losses = tiny_loft_run[2]
    expected = {"loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox",
                "loss_mask", "loss_offset"}
    assert set(losses) == expected
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
        assert float(v) >= 0, k
    # classification losses must be non-trivial at init
    assert float(losses["loss_rpn_cls"]) > 0.1
    assert float(losses["loss_cls"]) > 0.1


def test_loft_gradients_respect_frozen_stages(tiny_loft_run):
    grads = tiny_loft_run[3]
    bk = grads["backbone"]

    def total(tree):
        return sum(float(jnp.abs(g).sum())
                   for g in jax.tree_util.tree_leaves(tree))

    frozen = [bk[k] for k in bk if k in ("conv1", "bn1")
              or k.startswith("layer1_")]
    unfrozen = [bk[k] for k in bk if k.startswith(("layer2_", "layer3_",
                                                   "layer4_"))]
    assert total(frozen) == 0.0        # frozen_stages=1 -> no grads
    assert total(unfrozen) > 0.0
    assert total(grads["offset_head"]) > 0.0
    assert total(grads["rpn_head"]) > 0.0


def test_loft_simple_test_shapes(tiny_loft_run):
    model, variables = tiny_loft_run[:2]
    img = jnp.zeros((2, 128, 128, 3))
    out = model.apply(variables, img, jnp.full((2, 2), 128.0),
                      jnp.ones((2,)), method="simple_test")
    assert out["det_bboxes"].shape == (2, 16, 4)
    assert out["det_scores"].shape == (2, 16)
    assert out["mask_probs"].shape == (2, 16, 28, 28)
    assert out["offsets"].shape == (2, 16, 2)
    assert out["det_valid"].dtype == jnp.bool_


def test_loft_simple_test_rescale_contract(tiny_loft_run):
    """Offsets follow the boxes through rescale (reference
    ``rescale=True`` contract, test_mixins.py:213-241) and the decode
    clamp uses the true img_shape, not a hardcoded 1024."""
    model, variables = tiny_loft_run[:2]
    r = np.random.RandomState(7)
    img = jnp.asarray(r.randn(1, 128, 128, 3), jnp.float32)
    shape = jnp.full((1, 2), 128.0)
    out1 = model.apply(variables, img, shape, jnp.ones((1,)),
                       method="simple_test")
    out2 = model.apply(variables, img, shape, jnp.full((1,), 2.0),
                       method="simple_test")
    # same device-space detections, only the rescale divisor differs
    np.testing.assert_allclose(np.asarray(out2["det_bboxes"]) * 2.0,
                               np.asarray(out1["det_bboxes"]),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out2["offsets"]) * 2.0,
                               np.asarray(out1["offsets"]),
                               rtol=1e-5, atol=1e-4)
    # decode clamp bound comes from img_shape: |gx| <= w, |gy| <= h
    tiny = jnp.full((1, 2), 4.0)
    out3 = model.apply(variables, img, tiny, jnp.ones((1,)),
                       method="simple_test")
    off = np.asarray(out3["offsets"])[np.asarray(out3["det_valid"])]
    assert np.all(np.abs(off) <= 4.0 + 1e-4)


def test_real_bonai_config_param_structure():
    """eval_shape-init of the shipped LOFT+FOA config: structure + count."""
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.fromfile(os.path.join(
        repo, "configs/loft_foa/loft_foa_r50_fpn_2x_bonai.py"))
    model = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))
    params = shapes["params"]
    n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    # R50 (25.6M) + FPN (3.3M) + RPN (0.6M) + bbox (13M) + mask (2.6M)
    # + FOA offset head (4 branches x 10 convs + shared fcs ~ 36M)
    assert 60e6 < n_params < 120e6, n_params
    assert "backbone" in params and "offset_head" in params
    assert "branch3_conv9" in params["offset_head"]
