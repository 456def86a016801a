"""Polar offset regression (reg_num=3) and Pointobb2RBBox (reference
``offset_head.py:175-219``, ``transforms.py:1744-1833``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu.core.boxes import DeltaPolarOffsetCoder
from bonai_tpu.datasets.pipelines.transforms import Pointobb2RBBox
from bonai_tpu.models import build_detector

from test_models_forward import (demo_batch, tiny_loft_cfg, tiny_test_cfg,
                                 tiny_train_cfg)


def test_polar_reg3_roundtrip():
    """(length, cos, sin) of the coder-normalised pair decodes back to
    the original polar offset (reference get_offsets reg_num==3)."""
    coder = DeltaPolarOffsetCoder(target_means=(0.0, 0.0),
                                  target_stds=(0.5, 0.5))
    boxes = jnp.asarray([[10.0, 10.0, 50.0, 40.0]])
    polar = jnp.asarray([[12.0, 0.7]])          # (length, angle)
    enc = coder.encode(boxes, polar)
    reg3 = jnp.stack([enc[:, 0], jnp.cos(enc[:, 1]),
                      jnp.sin(enc[:, 1])], -1)
    angle = jnp.arctan2(reg3[:, 2], reg3[:, 1])
    dec = coder.decode(boxes, jnp.stack([reg3[:, 0], angle], -1))
    np.testing.assert_allclose(np.asarray(dec), np.asarray(polar),
                               rtol=1e-5)


def _polar_cfg():
    cfg = tiny_loft_cfg()
    cfg["roi_head"]["offset_head"] = dict(
        type="OffsetHead", num_convs=1, num_fcs=1, in_channels=32,
        conv_out_channels=32, fc_out_channels=32, reg_num=3,
        offset_coordinate="polar",
        offset_coder=dict(type="DeltaPolarOffsetCoder",
                          target_means=[0.0, 0.0],
                          target_stds=[0.5, 0.5]),
        loss_offset=dict(type="SmoothL1Loss", loss_weight=8.0))
    return cfg


def test_polar_loft_train_and_test():
    model = build_detector(_polar_cfg(), tiny_train_cfg(), tiny_test_cfg())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    batch = demo_batch(0)
    # pipeline OffsetTransform('xy2la') form: (length, angle)
    o = np.asarray(batch["gt_offsets"])
    batch["gt_offsets"] = jnp.asarray(
        np.stack([np.hypot(o[..., 0], o[..., 1]),
                  np.arctan2(o[..., 1], o[..., 0])], -1), jnp.float32)
    losses = model.apply(variables, batch, method="forward_train",
                         rngs={"sampling": jax.random.PRNGKey(2)})
    assert np.isfinite(float(losses["loss_offset"]))

    img = batch["image"]
    out = model.apply(variables, img, batch["img_shape"],
                      jnp.ones((img.shape[0],)), method="simple_test")
    offs = np.asarray(out["offsets"])
    assert offs.shape[-1] == 2
    assert np.isfinite(offs).all()
    # the decoded angle is the std-scaled atan2 output, bounded by
    # pi*std (reference decode applies no clamping; length may be
    # negative at init — a flipped direction the model learns away)
    assert np.abs(offs[..., 1]).max() <= np.pi * 0.5 + 1e-5


def test_pointobb2rbbox_thetaobb_and_hobb():
    sq = [10.0, 10.0, 30.0, 10.0, 30.0, 20.0, 10.0, 20.0]
    res = dict(rbbox_fields=["gt_rbboxes"],
               gt_rbboxes=np.asarray([sq], np.float32))
    out = Pointobb2RBBox("thetaobb")(dict(res))
    t = out["gt_rbboxes"][0]
    np.testing.assert_allclose(t[:2], [20.0, 15.0], atol=1.0)   # center
    assert {round(t[2]), round(t[3])} == {20, 10}               # w, h
    out = Pointobb2RBBox("hobb")(dict(res))
    h = out["gt_rbboxes"][0]
    np.testing.assert_allclose(h[:4], sq[:4], atol=1e-5)
    np.testing.assert_allclose(h[4], 10.0, atol=1e-5)
    # pointobb passthrough
    out = Pointobb2RBBox("pointobb")(dict(res))
    np.testing.assert_allclose(out["gt_rbboxes"][0], sq)
