"""Stretch op-layer equivalents (SURVEY §2.9: ConvWS / NonLocal /
ContextBlock / CornerPool / MaskedConv from mmcv)."""

import jax
import jax.numpy as jnp
import numpy as np

from bonai_tpu.ops.layers import (ContextBlock, ConvWS2d, NonLocal2d,
                                  conv_ws_2d, corner_pool, masked_conv2d)


def test_conv_ws_standardises_kernel():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(1, 8, 8, 4), jnp.float32)
    k = jnp.asarray(r.randn(3, 3, 4, 6) * 5 + 3, jnp.float32)
    out = conv_ws_2d(x, k)
    # equivalent to a plain conv with the z-scored kernel
    mean = jnp.mean(k, axis=(0, 1, 2), keepdims=True)
    std = jnp.std(k, axis=(0, 1, 2), keepdims=True)
    ref = jax.lax.conv_general_dilated(
        x, (k - mean) / (std + 1e-5), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)
    # module: standardisation makes output invariant to kernel rescaling
    m = ConvWS2d(features=6)
    v = m.init(jax.random.PRNGKey(0), x)
    o1 = m.apply(v, x)
    v2 = jax.tree_util.tree_map(lambda a: a * 10 if a.ndim == 4 else a, v)
    o2 = m.apply(v2, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-3, atol=1e-4)


def test_nonlocal_identity_at_init_then_learns():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, 6, 6, 8), jnp.float32)
    m = NonLocal2d()
    v = m.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(m.apply(v, x)), np.asarray(x),
                               atol=1e-6)          # zero-init conv_out
    v = jax.tree_util.tree_map(lambda a: a + 0.05, v)
    out = m.apply(v, x)
    assert not np.allclose(np.asarray(out), np.asarray(x))
    assert np.isfinite(np.asarray(out)).all()


def test_context_block_identity_at_init():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(2, 6, 6, 16), jnp.float32)
    for fusion in (("channel_add",), ("channel_add", "channel_mul")):
        m = ContextBlock(fusion_types=fusion)
        v = m.init(jax.random.PRNGKey(0), x)
        out = np.asarray(m.apply(v, x))
        if fusion == ("channel_add",):
            np.testing.assert_allclose(out, np.asarray(x), atol=1e-6)
        # mul path at zero-init: sigmoid(0) = 0.5 scaling
        assert np.isfinite(out).all()
    m = ContextBlock(pooling_type="avg")
    v = m.init(jax.random.PRNGKey(0), x)
    assert np.isfinite(np.asarray(m.apply(v, x))).all()


def test_corner_pool_directions():
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    top = np.asarray(corner_pool(x, "top"))[0, :, :, 0]
    # top pool: running max from below (max over rows i..H-1)
    np.testing.assert_allclose(top[0], [12, 13, 14, 15])
    np.testing.assert_allclose(top[3], [12, 13, 14, 15])
    bottom = np.asarray(corner_pool(x, "bottom"))[0, :, :, 0]
    np.testing.assert_allclose(bottom[0], [0, 1, 2, 3])
    np.testing.assert_allclose(bottom[3], [12, 13, 14, 15])
    left = np.asarray(corner_pool(x, "left"))[0, :, :, 0]
    np.testing.assert_allclose(left[:, 0], [3, 7, 11, 15])
    right = np.asarray(corner_pool(x, "right"))[0, :, :, 0]
    np.testing.assert_allclose(right[:, 3], [3, 7, 11, 15])


def test_masked_conv_zeroes_outside_mask():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(1, 6, 6, 3), jnp.float32)
    k = jnp.asarray(r.randn(3, 3, 3, 5), jnp.float32)
    mask = np.zeros((1, 6, 6), np.float32)
    mask[0, 2:4, 2:4] = 1
    out = np.asarray(masked_conv2d(x, jnp.asarray(mask), k))
    dense = np.asarray(jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(out[0, 2:4, 2:4], dense[0, 2:4, 2:4],
                               rtol=1e-5)
    assert (out[0, 0] == 0).all() and (out[0, 5] == 0).all()


def test_generalized_attention_modes():
    from bonai_tpu.ops.layers import GeneralizedAttention
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(1, 8, 8, 18), jnp.float32)
    for at in ("1000", "0010", "1111", "0101"):
        m = GeneralizedAttention(num_heads=2, attention_type=at,
                                 kv_stride=2)
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == x.shape
        # zero-init proj conv -> identity at init
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   atol=1e-6, err_msg=at)
        v2 = jax.tree_util.tree_map(lambda a: a + 0.05, v)
        out2 = m.apply(v2, x)
        assert np.isfinite(np.asarray(out2)).all()
        assert not np.allclose(np.asarray(out2), np.asarray(x))
