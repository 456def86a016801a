"""Fused Pallas RoIAlign (fwd+bwd) vs the XLA gather reference.

Interpret-mode numerical validation on CPU (compiled-TPU timing lives in
``tools/bench_roi_align.py``).  Window-bounded contract: test RoIs keep
their x-extent within 64 cells at the assigned level, matching
production shapes (buildings, aspect ≲5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu.ops.roi_align import multilevel_roi_align
from bonai_tpu.ops.pallas_roi_align_fused import pallas_multilevel_roi_align

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
def test_fused_forward_matches_gather(out_size):
    feats, rois = _fixture()
    ref = multilevel_roi_align(feats, rois, out_size, STRIDES,
                               sampling_ratio=2)
    got = pallas_multilevel_roi_align(feats, rois, out_size, STRIDES,
                                      sampling_ratio=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_backward_matches_gather():
    feats, rois = _fixture(seed=1, n=12)
    r = np.random.RandomState(2)
    # random cotangent so every bin contributes distinctly
    ct = jnp.asarray(r.randn(12, 7, 7, 32), jnp.float32)

    def loss(fn, interp):
        def f(fs):
            kw = dict(interpret=True) if interp else {}
            out = fn(fs, rois, 7, STRIDES, sampling_ratio=2, **kw)
            return jnp.sum(out * ct)
        return f

    g_ref = jax.grad(loss(multilevel_roi_align, False))(feats)
    g_pal = jax.grad(loss(pallas_multilevel_roi_align, True))(feats)
    for a, b, s in zip(g_pal, g_ref, STRIDES):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"stride {s}")


def test_fused_roi_valid_gates_fwd_and_bwd():
    feats, rois = _fixture(seed=3, n=8)
    valid = jnp.asarray([True, True, False, True, False, True, True, True])

    out = pallas_multilevel_roi_align(feats, rois, 7, STRIDES,
                                      sampling_ratio=2, roi_valid=valid,
                                      interpret=True)
    assert float(jnp.abs(out[2]).sum()) == 0.0
    assert float(jnp.abs(out[4]).sum()) == 0.0
    ref = multilevel_roi_align(feats, rois, 7, STRIDES, sampling_ratio=2,
                               roi_valid=valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def f(fs):
        o = pallas_multilevel_roi_align(fs, rois, 7, STRIDES,
                                        sampling_ratio=2, roi_valid=valid,
                                        interpret=True)
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


def test_fused_overlapping_rois_backward():
    """Heavily overlapping RoIs stress the cross-RoI RMW fence and the
    intra-RoI row dedup (identical boxes share every strip row)."""
    r = np.random.RandomState(4)
    feats = [jnp.asarray(r.randn(1, 64 // s * 4, 64 // s * 4, 16),
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
    g_pal = jax.grad(f(pallas_multilevel_roi_align, True))(feats)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed,n", [(1, 12), (4, 5)])
def test_rmw_backward_matches_gather(seed, n):
    """The Pallas read-modify-write backward (backward='rmw') must equal
    the gather-transpose scatter, including heavy RoI overlap."""
    if seed == 4:
        r = np.random.RandomState(4)
        feats = [jnp.asarray(r.randn(1, 256 // s, 256 // s, 16),
                             jnp.float32) for s in STRIDES]
        box = np.array([0.0, 40.0, 40.0, 140.0, 140.0], np.float32)
        rois = jnp.asarray(np.stack([box, box, box + [0, 1, 1, 1, 1],
                                     box, box + [0, 2, 0, 2, 0]]))
        ct = jnp.asarray(r.randn(n, 7, 7, 16), jnp.float32)
    else:
        feats, rois = _fixture(seed=seed, n=n)
        ct = jnp.asarray(np.random.RandomState(2).randn(n, 7, 7, 32),
                         jnp.float32)

    def f(fn, **kw):
        def inner(fs):
            return jnp.sum(fn(fs, rois, 7, STRIDES, sampling_ratio=2,
                              **kw) * ct)
        return inner

    g_ref = jax.grad(f(multilevel_roi_align))(feats)
    g_rmw = jax.grad(f(pallas_multilevel_roi_align, interpret=True,
                       backward="rmw"))(feats)
    for a, b, s in zip(g_rmw, g_ref, STRIDES):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"stride {s}")


def test_rmw_backward_narrow_level_partial_overlap():
    """RoIs pushed to the coarsest level where the level width is smaller
    than the strip window exercise the symmetric partner-total path."""
    r = np.random.RandomState(7)
    # tiny image: P5 level is 8x8 (< window 48) for a 256px image
    feats = [jnp.asarray(r.randn(1, 256 // s, 256 // s, 16), jnp.float32)
             for s in STRIDES]
    # huge rois -> coarsest level (Wl = 8 cells < window)
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

    g_ref = jax.grad(f(multilevel_roi_align))(feats)
    g_rmw = jax.grad(f(pallas_multilevel_roi_align, interpret=True,
                       backward="rmw"))(feats)
    for a, b, s in zip(g_rmw, g_ref, STRIDES):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"stride {s}")


def test_chunked_roi_axis_matches_unchunked():
    """SMEM guard: >chunk RoIs split into multiple kernel calls; fwd and
    bwd must match the single-call path (eval cfg hits R=6000)."""
    feats, rois = _fixture(n=24)

    def run(chunk):
        def f(fs):
            out = pallas_multilevel_roi_align(
                fs, rois, 7, STRIDES, sampling_ratio=2, interpret=True,
                chunk=chunk)
            return jnp.sum(out * out), out
        (loss, out), grads = jax.value_and_grad(f, has_aux=True)(feats)
        return out, grads

    out1, g1 = run(chunk=2048)     # single call (24 <= 2048)
    out2, g2 = run(chunk=10)       # 3 chunks with padding
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
