"""Experimental attribute heads (height / angle / offset+height /
side-face / offset-field / offset-reweight) — the analogs of reference
``mmdet/models/roi_heads/test_mixins.py:293-445`` and the semi-RPN
angle gating (``semi_rpn_head.py:51-60``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu.models import build_detector

from test_models_forward import (demo_batch, tiny_loft_cfg, tiny_test_cfg,
                                 tiny_train_cfg)


def _attr_cfg():
    cfg = tiny_loft_cfg()
    cfg["rpn_head"]["type"] = "SemiRPNHead"
    rh = cfg["roi_head"]
    rh["height_head"] = dict(num_convs=1, num_fcs=1, conv_out_channels=32,
                             fc_out_channels=32, loss_weight=1.0,
                             height_coder=dict(target_means=[0.0],
                                               target_stds=[4.0]))
    rh["offset_height_head"] = dict(num_convs=1, num_fcs=1,
                                    conv_out_channels=32,
                                    fc_out_channels=32)
    rh["angle_head"] = dict(in_channels=32, conv_out_channels=32,
                            num_convs=1, loss_weight=1.0)
    rh["side_face_head"] = dict(num_convs=1, conv_out_channels=32)
    rh["offset_field_head"] = dict(num_convs=1, conv_out_channels=32)
    rh["offset_reweight"] = True
    return cfg


def _attr_batch(seed=0, b=2, size=128):
    r = np.random.RandomState(seed)
    batch = demo_batch(seed, b=b, size=size)
    g = batch["gt_bboxes"].shape[1]
    batch["gt_building_heights"] = jnp.asarray(
        r.uniform(3, 30, (b, g)).astype(np.float32))
    batch["gt_angle"] = jnp.asarray(
        r.uniform(0.1, 0.6, (b,)).astype(np.float32))
    batch["gt_side_face_maps"] = jnp.asarray(
        (r.rand(b, size, size) > 0.7).astype(np.float32))
    batch["gt_offset_field"] = jnp.asarray(
        r.uniform(-10, 10, (b, size, size, 2)).astype(np.float32))
    batch["gt_footprint_bboxes"] = batch["gt_bboxes"]
    batch["gt_only_footprint_flag"] = jnp.asarray([1.0] + [0.0] * (b - 1))
    return batch


@pytest.fixture(scope="module")
def attr_run():
    model = build_detector(_attr_cfg(), tiny_train_cfg(), tiny_test_cfg())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    batch = _attr_batch()
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
    return model, variables, losses, grads, batch


def test_attribute_losses_present_and_finite(attr_run):
    _, _, losses, _, _ = attr_run
    for k in ("loss_height", "loss_offset_height", "loss_angle",
              "loss_side_face", "loss_offset_field", "loss_offset"):
        assert k in losses, k
        assert np.isfinite(float(losses[k])), k
        assert float(losses[k]) >= 0.0, k


def test_attribute_heads_receive_gradients(attr_run):
    _, _, _, grads, _ = attr_run

    def total(tree):
        return sum(float(jnp.abs(g).sum())
                   for g in jax.tree_util.tree_leaves(tree))

    for name in ("height_head", "offset_height_head", "angle_head",
                 "side_face_head", "offset_field_head"):
        assert total(grads[name]) > 0.0, name


def test_attribute_simple_test_outputs(attr_run):
    model, variables, _, _, _ = attr_run
    b, size, p = 2, 128, 16
    img = jnp.asarray(np.random.RandomState(1).randn(
        b, size, size, 3).astype(np.float32))
    out = model.apply(variables, img,
                      jnp.full((b, 2), float(size)),
                      jnp.ones((b,)), method="simple_test")
    assert out["heights"].shape == (b, p)
    assert float(jnp.min(out["heights"])) >= 0.0      # decode clamps >= 0
    assert out["offset_height_offsets"].shape == (b, p, 2)
    assert out["offset_height_heights"].shape == (b, p)
    assert out["angle"].shape == (b,)
    assert out["side_face_probs"].shape[:2] == (b, p)
    assert out["offset_field_offsets"].shape == (b, p, 2)
    for k in ("heights", "angle", "offset_field_offsets", "offsets"):
        assert np.all(np.isfinite(np.asarray(out[k]))), k


def test_height_coder_roundtrip():
    from bonai_tpu.models.roi_heads.attribute_heads import (delta2height,
                                                            height2delta)
    h = jnp.asarray([0.0, 3.5, 30.0])
    enc = height2delta(h, (1.0,), (5.0,))
    np.testing.assert_allclose(np.asarray(enc), (np.asarray(h) - 1.0) / 5.0,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(delta2height(enc, (1.0,), (5.0,))),
                               np.asarray(h), rtol=1e-6)
    # decode clamps negatives to zero
    assert float(delta2height(jnp.asarray([-10.0]), (0.0,), (1.0,))[0]) == 0.0


def test_offset_field_aggregation_uniform_field():
    """A spatially-uniform field must decode to exactly that offset no
    matter the mask (weighted mean of a constant)."""
    from bonai_tpu.models.roi_heads.attribute_heads import (
        offset_field_to_offsets)
    n, s = 3, 8
    field = jnp.broadcast_to(jnp.asarray([2.5, -1.25]), (n, s, s, 2))
    mask_logits = jnp.asarray(
        np.random.RandomState(0).randn(n, 4, 4, 1).astype(np.float32))
    out = offset_field_to_offsets(field, mask_logits)
    np.testing.assert_allclose(np.asarray(out),
                               np.tile([2.5, -1.25], (n, 1)), rtol=1e-5)


def test_reweight_formula():
    """w = (sigmoid(resize(side+mask)) + 1)/2 ∈ [0.5, 1], so features are
    attenuated at most 2x and never amplified (test_mixins.py:430-433)."""
    from bonai_tpu.models.roi_heads.attribute_heads import reweight_roi_feats
    r = np.random.RandomState(0)
    feats = jnp.asarray(r.randn(4, 7, 7, 8).astype(np.float32))
    mask = jnp.asarray(r.randn(4, 14, 14, 1).astype(np.float32))
    side = jnp.asarray(r.randn(4, 14, 14, 1).astype(np.float32))
    out = reweight_roi_feats(feats, mask, side)
    ratio = np.asarray(jnp.abs(out) / jnp.maximum(jnp.abs(feats), 1e-9))
    assert ratio.max() <= 1.0 + 1e-5
    assert ratio.min() >= 0.5 - 1e-5
    # exact check at one position
    fused = jax.image.resize(side + mask, (4, 7, 7, 1), method="bilinear")
    w = (jax.nn.sigmoid(fused) + 1) / 2
    np.testing.assert_allclose(np.asarray(out), np.asarray(feats * w),
                               rtol=1e-5)


def test_semi_rpn_reg_weight_zeroes_flagged_images():
    """reference ``semi_rpn_head.py:146``: bbox_weights = 1 - flag —
    flagged (footprint-only) images contribute cls but no reg loss."""
    from bonai_tpu.core.anchors import AnchorGenerator
    from bonai_tpu.models.dense_heads.rpn_head import rpn_loss
    r = np.random.RandomState(0)
    b, size = 2, 32
    gen = AnchorGenerator(scales=[2], ratios=[1.0], strides=[8])
    anchors = jnp.asarray(gen.grid_anchors([(size // 8, size // 8)])[0])
    a = anchors.shape[0]
    cls = [jnp.asarray(r.randn(b, size // 8, size // 8, 1), jnp.float32)]
    reg = [jnp.asarray(r.randn(b, size // 8, size // 8, 4), jnp.float32)]
    gt = jnp.asarray([[[4.0, 4.0, 20.0, 20.0]]] * b)
    gv = jnp.ones((b, 1), bool)
    cfg = dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                             min_pos_iou=0.3),
               sampler=dict(num=16, pos_fraction=0.5))
    rng = jax.random.PRNGKey(0)
    base = rpn_loss(cls, reg, anchors, gt, gv, rng, cfg)
    both_off = rpn_loss(cls, reg, anchors, gt, gv, rng, cfg,
                        reg_weight=jnp.zeros((b,)))
    assert float(both_off["loss_rpn_bbox"]) == 0.0
    np.testing.assert_allclose(float(both_off["loss_rpn_cls"]),
                               float(base["loss_rpn_cls"]), rtol=1e-6)
    one_off = rpn_loss(cls, reg, anchors, gt, gv, rng, cfg,
                       reg_weight=jnp.asarray([0.0, 1.0]))
    assert 0.0 < float(one_off["loss_rpn_bbox"]) \
        < float(base["loss_rpn_bbox"]) + 1e-6
