"""Block-DMA Pallas RoIAlign (fwd+bwd) vs the XLA gather reference.

Interpret-mode numerical validation on CPU (hardware timing:
``tools/bench_roi_kernel.py --impl block``).  Test RoIs keep both
extents within the block window at the assigned level, where the block
kernel's symmetric push matches the strip/gather level rule exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu.ops.roi_align import multilevel_roi_align
from bonai_tpu.ops.pallas_roi_align_block import pallas_block_roi_align

STRIDES = [4, 8, 16, 32]


def _fixture(seed=0, B=2, S=256, C=32, n=24):
    r = np.random.RandomState(seed)
    feats = [jnp.asarray(r.randn(B, S // s, S // s, C), jnp.float32)
             for s in STRIDES]
    xy1 = r.uniform(0, S * 0.6, (n, 2)).astype(np.float32)
    wh = r.uniform(16, S * 0.35, (n, 2)).astype(np.float32)
    b = r.randint(0, B, (n, 1)).astype(np.float32)
    rois = jnp.asarray(np.concatenate([b, xy1, np.minimum(xy1 + wh, S - 1)],
                                      axis=1))
    return feats, rois


@pytest.mark.parametrize("out_size", [7, 14])
def test_block_forward_matches_gather(out_size):
    feats, rois = _fixture()
    ref = multilevel_roi_align(feats, rois, out_size, STRIDES,
                               sampling_ratio=2)
    got = pallas_block_roi_align(feats, rois, out_size, STRIDES,
                                 sampling_ratio=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_block_backward_matches_gather():
    feats, rois = _fixture(seed=1, n=12)
    r = np.random.RandomState(2)
    ct = jnp.asarray(r.randn(12, 7, 7, 32), jnp.float32)

    def loss(fn, interp):
        def f(fs):
            kw = dict(interpret=True) if interp else {}
            out = fn(fs, rois, 7, STRIDES, sampling_ratio=2, **kw)
            return jnp.sum(out * ct)
        return f

    g_ref = jax.grad(loss(multilevel_roi_align, False))(feats)
    g_blk = jax.grad(loss(pallas_block_roi_align, True))(feats)
    for a, b, s in zip(g_blk, g_ref, STRIDES):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"stride {s}")


def test_block_overlapping_rois_backward():
    """Heavily overlapping RoIs stress the cross-RoI chain fence (blocks
    of identical boxes RMW the same rows on alternating chains)."""
    r = np.random.RandomState(4)
    feats = [jnp.asarray(r.randn(1, 256 // s, 256 // s, 16),
                         jnp.float32) for s in STRIDES]
    box = np.array([0.0, 40.0, 40.0, 140.0, 140.0], np.float32)
    rois = jnp.asarray(np.stack([box, box, box + [0, 1, 1, 1, 1],
                                 box, box + [0, 2, 0, 2, 0]]))
    ct = jnp.asarray(r.randn(5, 7, 7, 16), jnp.float32)

    def f(fn, interp):
        def inner(fs):
            kw = dict(interpret=True) if interp else {}
            return jnp.sum(fn(fs, rois, 7, STRIDES, sampling_ratio=2,
                              **kw) * ct)
        return inner

    g_ref = jax.grad(f(multilevel_roi_align, False))(feats)
    g_blk = jax.grad(f(pallas_block_roi_align, True))(feats)
    for a, b in zip(g_blk, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_block_roi_valid_gates_fwd_and_bwd():
    feats, rois = _fixture(seed=3, n=8)
    valid = jnp.asarray([True, True, False, True, False, True, True, True])

    out = pallas_block_roi_align(feats, rois, 7, STRIDES,
                                 sampling_ratio=2, roi_valid=valid,
                                 interpret=True)
    assert float(jnp.abs(out[2]).sum()) == 0.0
    assert float(jnp.abs(out[4]).sum()) == 0.0
    ref = multilevel_roi_align(feats, rois, 7, STRIDES, sampling_ratio=2,
                               roi_valid=valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def f(fs):
        o = pallas_block_roi_align(fs, rois, 7, STRIDES, sampling_ratio=2,
                                   roi_valid=valid, interpret=True)
        return jnp.sum(o ** 2)

    def f_ref(fs):
        o = multilevel_roi_align(fs, rois, 7, STRIDES, sampling_ratio=2,
                                 roi_valid=valid)
        return jnp.sum(o ** 2)

    g = jax.grad(f)(feats)
    gr = jax.grad(f_ref)(feats)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_block_narrow_level_rois():
    """Large RoIs land on the coarsest level, which is narrower than the
    block window and therefore x-padded; grads to the pad must vanish.

    ``window=40`` here: RoI #2 spans 29.25 cells at its natural level,
    inside window-4=36 (exact parity) but outside the production default
    32's 28-cell bound (push semantics — covered by the next test)."""
    r = np.random.RandomState(7)
    feats = [jnp.asarray(r.randn(1, 256 // s, 256 // s, 16), jnp.float32)
             for s in STRIDES]
    rois = jnp.asarray(np.array([
        [0, 8, 8, 240, 240],
        [0, 16, 4, 250, 200],
        [0, 4, 30, 200, 251],
    ], np.float32))
    ct = jnp.asarray(r.randn(3, 7, 7, 16), jnp.float32)

    def f(fn, **kw):
        def inner(fs):
            return jnp.sum(fn(fs, rois, 7, STRIDES, sampling_ratio=2,
                              **kw) * ct)
        return inner

    out_ref = multilevel_roi_align(feats, rois, 7, STRIDES,
                                   sampling_ratio=2)
    out_blk = pallas_block_roi_align(feats, rois, 7, STRIDES,
                                     sampling_ratio=2, interpret=True,
                                     window=40)
    np.testing.assert_allclose(np.asarray(out_blk), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
    g_ref = jax.grad(f(multilevel_roi_align))(feats)
    g_blk = jax.grad(f(pallas_block_roi_align, interpret=True,
                       window=40))(feats)
    for a, b, s in zip(g_blk, g_ref, STRIDES):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"stride {s}")


def test_block_window_push_semantics():
    """The default window=32 pushes an RoI whose max extent exceeds 28
    cells at its sqrt-rule level one level coarser; the pushed result
    must equal the gather reference evaluated AT that coarser level."""
    r = np.random.RandomState(9)
    feats = [jnp.asarray(r.randn(1, 256 // s, 256 // s, 16), jnp.float32)
             for s in STRIDES]
    # w=240, h=60: sqrt(wh)=120 -> natural level 1 (stride 8) where the
    # x-extent is 30 cells > 28 -> pushed to level 2 (15 cells, fits).
    roi = jnp.asarray(np.array([[0, 8, 40, 248, 100]], np.float32))
    out_blk = pallas_block_roi_align(feats, roi, 7, STRIDES,
                                     sampling_ratio=2, interpret=True)
    # single-level gather = "force level 2" reference
    ref_l2 = multilevel_roi_align([feats[2]], roi, 7, [16],
                                  sampling_ratio=2)
    np.testing.assert_allclose(np.asarray(out_blk), np.asarray(ref_l2),
                               rtol=1e-4, atol=1e-4)
    # sanity: the natural-level reference differs (the push is real)
    ref_nat = multilevel_roi_align(feats, roi, 7, STRIDES,
                                   sampling_ratio=2)
    assert float(jnp.abs(ref_nat - ref_l2).max()) > 1e-3


def test_block_chunked_matches_unchunked():
    feats, rois = _fixture(n=24)

    def run(chunk):
        def f(fs):
            out = pallas_block_roi_align(
                fs, rois, 7, STRIDES, sampling_ratio=2, interpret=True,
                chunk=chunk)
            return jnp.sum(out * out), out
        (loss, out), grads = jax.value_and_grad(f, has_aux=True)(feats)
        return out, grads

    out1, g1 = run(chunk=2048)
    out2, g2 = run(chunk=10)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
