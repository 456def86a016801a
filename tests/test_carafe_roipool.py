"""CARAFE, FPN-CARAFE, RoIPool, DeformRoIPooling (reference mmcv ops +
``mmdet/models/necks/fpn_carafe.py``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bonai_tpu.ops.carafe import CARAFEPack, carafe
from bonai_tpu.ops.roi_pool import deform_roi_pool, roi_pool


def test_carafe_identity_kernel():
    """A one-hot kernel at the window center reproduces nearest-neighbour
    2x upsampling exactly."""
    r = np.random.RandomState(0)
    feat = jnp.asarray(r.randn(1, 6, 6, 3), jnp.float32)
    k = 5
    masks = np.zeros((1, 12, 12, k * k), np.float32)
    masks[..., (k // 2) * k + k // 2] = 1.0      # center tap
    out = carafe(feat, jnp.asarray(masks), up_kernel=k, scale=2)
    ref = np.repeat(np.repeat(np.asarray(feat), 2, 1), 2, 2)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_carafe_uniform_kernel_is_box_filter():
    """Uniform kernels average the kxk neighbourhood (zero-padded)."""
    feat = jnp.ones((1, 8, 8, 2))
    k = 3
    masks = jnp.full((1, 16, 16, k * k), 1.0 / (k * k))
    out = np.asarray(carafe(feat, masks, up_kernel=k, scale=2))
    # interior: average of 9 ones == 1
    assert np.allclose(out[0, 4:12, 4:12], 1.0, atol=1e-6)
    # corner: only 4 of 9 taps in-bounds
    assert out[0, 0, 0, 0] == pytest.approx(4.0 / 9.0)


def test_carafe_pack_shapes_and_grad():
    m = CARAFEPack(channels=8, scale_factor=2, up_kernel=5,
                   compressed_channels=4)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 8), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)

    def f(params):
        return jnp.sum(m.apply({"params": params}, x) ** 2)

    val, g = jax.value_and_grad(f)(v["params"])
    assert np.isfinite(float(val))
    gn = sum(float(np.abs(np.asarray(l)).sum())
             for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
    out = m.apply(v, x)
    assert out.shape == (2, 16, 16, 8)


def test_roi_pool_max_semantics():
    """Max over a bin picks the hottest pixel (dense sampling grid)."""
    feat = np.zeros((1, 16, 16, 1), np.float32)
    feat[0, 3, 5, 0] = 7.0
    feat[0, 10, 12, 0] = 9.0
    rois = jnp.asarray([[0.0, 0.0, 0.0, 15.0, 15.0]])
    out = np.asarray(roi_pool(jnp.asarray(feat), rois, out_size=2,
                              samples=8))
    assert out[0, 0, 0, 0] == pytest.approx(7.0)   # top-left bin
    assert out[0, 1, 1, 0] == pytest.approx(9.0)   # bottom-right bin
    assert out[0, 0, 1, 0] == pytest.approx(0.0)


def test_deform_roi_pool_offset_shifts_samples():
    """Zero offsets == plain average pooling; a constant-gradient field
    shifts linearly with the offset."""
    H = W = 16
    gx = np.tile(np.arange(W, dtype=np.float32), (H, 1))
    feat = jnp.asarray(gx[None, :, :, None])
    rois = jnp.asarray([[0.0, 4.0, 4.0, 12.0, 12.0]])
    S = 2
    zero = jnp.zeros((1, S, S, 2))
    base = np.asarray(deform_roi_pool(feat, rois, zero, out_size=S))
    # shift all bins right by gamma * rw * 1.0 = 0.1 * 8 = 0.8 px
    off = jnp.zeros((1, S, S, 2)).at[..., 0].set(1.0)
    moved = np.asarray(deform_roi_pool(feat, rois, off, out_size=S))
    np.testing.assert_allclose(moved - base, 0.8, atol=1e-4)


def test_fpn_carafe_neck_builds():
    from bonai_tpu.models.necks.fpn_carafe import FPN_CARAFE
    m = FPN_CARAFE(in_channels=(8, 16, 32, 64), out_channels=16,
                   num_outs=5, compressed_channels=4)
    feats = [jnp.ones((1, 2 ** (5 - i), 2 ** (5 - i), c))
             for i, c in enumerate((8, 16, 32, 64))]
    v = m.init(jax.random.PRNGKey(0), feats)
    outs = m.apply(v, feats)
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4, 2]
    assert all(o.shape[-1] == 16 for o in outs)
