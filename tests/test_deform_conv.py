"""Deformable conv v1/v2 (reference ``mmcv.ops.DeformConv2d`` /
``ModulatedDeformConv2d`` used by configs/dcn)."""

import jax
import jax.numpy as jnp
import numpy as np

from bonai_tpu.ops.deform_conv import (DeformConv2d, ModulatedDeformConv2d,
                                       deform_conv2d)


def _plain_conv(x, k, padding=1, stride=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_zero_offset_equals_plain_conv():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, 10, 10, 4), jnp.float32)
    k = jnp.asarray(r.randn(3, 3, 4, 6), jnp.float32)
    off = jnp.zeros((2, 10, 10, 18))
    out = deform_conv2d(x, off, k)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_plain_conv(x, k)),
                               rtol=2e-2, atol=2e-2)


def test_integer_offset_shifts_sampling():
    """A uniform (0, +1) offset on every kernel point equals convolving
    the input shifted left by one pixel."""
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(1, 8, 8, 3), jnp.float32)
    k = jnp.asarray(r.randn(3, 3, 3, 5), jnp.float32)
    off = jnp.zeros((1, 8, 8, 18))
    off = off.at[..., 1::2].set(1.0)           # dx = +1 everywhere
    out = deform_conv2d(x, off, k)
    x_shift = jnp.concatenate([x[:, :, 1:], jnp.zeros((1, 8, 1, 3))], 2)
    ref = _plain_conv(x_shift, k)
    # interior matches exactly; borders differ (zero-padding alignment)
    np.testing.assert_allclose(np.asarray(out)[:, 2:-2, 2:-2],
                               np.asarray(ref)[:, 2:-2, 2:-2],
                               rtol=2e-2, atol=2e-2)


def test_fractional_offset_bilinear():
    """Offset of +0.5 in x averages neighbouring samples (bilinear)."""
    x = jnp.zeros((1, 5, 5, 1)).at[0, 2, 2, 0].set(1.0)
    k = jnp.zeros((1, 1, 1, 1)).at[0, 0, 0, 0].set(1.0)
    off = jnp.zeros((1, 5, 5, 2)).at[..., 1].set(0.5)
    out = np.asarray(deform_conv2d(x, off, k, padding=0))
    assert abs(out[0, 2, 1, 0] - 0.5) < 1e-6   # half-way between 1 and 2
    assert abs(out[0, 2, 2, 0] - 0.5) < 1e-6


def test_modulated_dcn_starts_as_plain_conv_and_grads_flow():
    r = np.random.RandomState(2)
    x = jnp.asarray(r.randn(1, 8, 8, 4), jnp.float32)
    m = ModulatedDeformConv2d(features=6)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    # zero-init offset conv -> offsets 0, mask logits 0 -> sigmoid 0.5
    k = v["params"]["kernel"]
    np.testing.assert_allclose(np.asarray(out),
                               0.5 * np.asarray(_plain_conv(x, k)),
                               rtol=2e-2, atol=2e-2)

    def loss(p):
        return jnp.sum(m.apply({"params": p}, x) ** 2)
    g = jax.grad(loss)(v["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    # offset conv receives gradient through the bilinear sampling
    assert float(jnp.abs(g["conv_offset"]["kernel"]).sum()) > 0


def test_deform_conv_module_stride2():
    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(1, 8, 8, 4), jnp.float32)
    m = DeformConv2d(features=6, stride=2)
    off = jnp.zeros((1, 4, 4, 18))
    v = m.init(jax.random.PRNGKey(0), x, off)
    out = m.apply(v, x, off)
    assert out.shape == (1, 4, 4, 6)
    k = v["params"]["kernel"]
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_plain_conv(x, k, stride=2)),
                               rtol=2e-2, atol=2e-2)


def test_resnet_dcn_stages():
    """reference configs/dcn: dcn=dict(...) + stage_with_dcn toggles the
    3x3 conv of selected stages to modulated deformable conv."""
    from bonai_tpu.models.backbones.resnet import ResNet
    m = ResNet(depth=50, frozen_stages=-1, dcn=dict(type="DCNv2"),
               stage_with_dcn=(False, False, True, True))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    p = v["params"]
    assert "conv_offset" in p["layer3_0"]["conv2"]
    assert "conv_offset" in p["layer4_0"]["conv2"]
    assert "conv_offset" not in p["layer2_0"].get("conv2", {})
    outs = m.apply(v, jnp.asarray(
        np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32))
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)
