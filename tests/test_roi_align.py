import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu.ops import roi_align, multilevel_roi_align, map_roi_levels
from bonai_tpu.core.masks import mask_targets_from_instance_masks


def roi_align_np(feat, rois, out_size, spatial_scale, sr, aligned=True):
    """Exact (slow) numpy RoIAlign with the same fixed sampling grid."""
    B, H, W, C = feat.shape
    R = rois.shape[0]
    oh, ow = out_size
    out = np.zeros((R, oh, ow, C), np.float32)
    off = 0.5 if aligned else 0.0
    for r in range(R):
        b = int(rois[r, 0])
        x1, y1, x2, y2 = rois[r, 1:] * spatial_scale
        x1, y1, x2, y2 = x1 - off, y1 - off, x2 - off, y2 - off
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bh, bw = rh / oh, rw / ow
        for i in range(oh):
            for j in range(ow):
                acc = np.zeros(C, np.float32)
                for si in range(sr):
                    for sj in range(sr):
                        y = y1 + (i + (si + 0.5) / sr) * bh
                        x = x1 + (j + (sj + 0.5) / sr) * bw
                        if y < -1.0 or y > H or x < -1.0 or x > W:
                            continue
                        y_ = min(max(y, 0.0), H - 1.0)
                        x_ = min(max(x, 0.0), W - 1.0)
                        y0 = min(int(np.floor(y_)), H - 2)
                        x0 = min(int(np.floor(x_)), W - 2)
                        ly, lx = y_ - y0, x_ - x0
                        acc += ((1 - ly) * (1 - lx) * feat[b, y0, x0]
                                + (1 - ly) * lx * feat[b, y0, x0 + 1]
                                + ly * (1 - lx) * feat[b, y0 + 1, x0]
                                + ly * lx * feat[b, y0 + 1, x0 + 1])
                out[r, i, j] = acc / (sr * sr)
    return out


def test_roi_align_matches_numpy_reference():
    rng = np.random.RandomState(0)
    feat = rng.randn(2, 16, 20, 3).astype(np.float32)
    rois = np.array([
        [0, 2.0, 3.0, 34.0, 30.0],
        [1, 0.0, 0.0, 80.0, 64.0],
        [0, 10.5, 7.25, 22.75, 19.5],
        [1, -4.0, -4.0, 8.0, 8.0],       # partially outside
    ], np.float32)
    got = roi_align(jnp.asarray(feat), jnp.asarray(rois), 7,
                    spatial_scale=0.25, sampling_ratio=2)
    exp = roi_align_np(feat, rois, (7, 7), 0.25, 2)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-4, atol=1e-5)


def test_roi_align_gradient_flows():
    feat = jnp.ones((1, 8, 8, 2))
    rois = jnp.array([[0, 4.0, 4.0, 20.0, 20.0]])
    g = jax.grad(lambda f: roi_align(f, rois, 7, 0.25, 2).sum())(feat)
    assert float(jnp.abs(g).sum()) > 0


def test_map_roi_levels():
    boxes = jnp.array([
        [0, 0, 30, 30],      # scale 30 < 56 -> level 0
        [0, 0, 112, 112],    # scale 112 = 56*2 -> level 1
        [0, 0, 224, 224],    # level 2
        [0, 0, 450, 450],    # level 3
        [0, 0, 2000, 2000],  # clamped to 3
    ], jnp.float32)
    lv = map_roi_levels(boxes, 4)
    np.testing.assert_array_equal(np.asarray(lv), [0, 1, 2, 3, 3])


def test_multilevel_matches_single_level():
    """RoIs mapped to one level must equal single-level roi_align there."""
    rng = np.random.RandomState(1)
    B, C = 2, 4
    feats = [jnp.asarray(rng.randn(B, 64 // s, 64 // s, C).astype(np.float32))
             for s in (1, 2, 4, 8)]   # strides 4,8,16,32 on a 256 image
    strides = [4, 8, 16, 32]
    # small roi -> level 0; large -> level 3
    rois = jnp.array([
        [0, 8.0, 8.0, 40.0, 48.0],         # scale ~38 -> lvl 0
        [1, 0.0, 0.0, 250.0, 250.0],        # scale 250 -> lvl 2
    ], jnp.float32)
    got = multilevel_roi_align(feats, rois, 7, strides, sampling_ratio=2)
    exp0 = roi_align(feats[0], rois[:1], 7, 1.0 / strides[0], 2)
    exp2 = roi_align(feats[2], rois[1:], 7, 1.0 / strides[2], 2)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(exp0[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(exp2[0]),
                               rtol=1e-4, atol=1e-5)


def test_blocked_matches_gather_impl():
    from bonai_tpu.ops.roi_align_blocked import multilevel_roi_align_blocked
    rng = np.random.RandomState(7)
    B, C = 2, 8
    feats = [jnp.asarray(rng.randn(B, 256 // s, 256 // s, C)
                         .astype(np.float32)) for s in (4, 8, 16, 32)]
    strides = [4, 8, 16, 32]
    R = 24
    ctr = rng.uniform(30, 220, (R, 2))
    sc = rng.uniform(20, 150, (R, 1))
    ar = rng.uniform(0.5, 2.0, (R, 1))
    w = sc * np.sqrt(ar)
    h = sc / np.sqrt(ar)
    boxes = np.concatenate([ctr - np.c_[w, h] / 2,
                            ctr + np.c_[w, h] / 2], 1).clip(0, 256)
    rois = jnp.asarray(np.concatenate(
        [rng.randint(0, B, (R, 1)), boxes], 1), jnp.float32)
    ref = multilevel_roi_align(feats, rois, 7, strides, sampling_ratio=2)
    got = multilevel_roi_align_blocked(feats, rois, 7, strides,
                                       sampling_ratio=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_blocked_valid_mask_and_grad():
    from bonai_tpu.ops.roi_align_blocked import multilevel_roi_align_blocked
    feats = [jnp.ones((1, 64 // s * 4, 64 // s * 4, 4)) for s in
             (4, 8, 16, 32)]
    rois = jnp.array([[0, 8, 8, 40, 40], [0, 8, 8, 40, 40]], jnp.float32)
    out = multilevel_roi_align_blocked(
        feats, rois, 7, [4, 8, 16, 32],
        roi_valid=jnp.array([True, False]))
    assert float(jnp.abs(out[1]).sum()) == 0
    assert float(jnp.abs(out[0]).sum()) > 0
    g = jax.grad(lambda f: jnp.sum(multilevel_roi_align_blocked(
        [f] + feats[1:], rois, 7, [4, 8, 16, 32])))(feats[0])
    assert float(jnp.abs(g).sum()) > 0


def test_multilevel_invalid_rois_zero():
    feats = [jnp.ones((1, 16, 16, 2)) for _ in range(4)]
    rois = jnp.array([[0, 0, 0, 32, 32], [0, 0, 0, 32, 32]], jnp.float32)
    out = multilevel_roi_align(feats, rois, 7, [4, 8, 16, 32],
                               roi_valid=jnp.array([True, False]))
    assert float(jnp.abs(out[1]).sum()) == 0
    assert float(jnp.abs(out[0]).sum()) > 0


def test_mask_targets_identity_proposal():
    """Proposal == gt box reproduces the (resized) instance mask."""
    M = 28
    inst = np.zeros((1, M, M), np.float32)
    inst[0, :, :M // 2] = 1.0           # left half roof
    gt = jnp.array([[10., 10., 40., 40.]])
    prop = gt
    t = mask_targets_from_instance_masks(prop, gt, jnp.asarray(inst), 28)
    t = np.asarray(t[0])
    assert t[:, :12].mean() > 0.99      # left part solidly 1
    assert t[:, 16:].mean() < 0.01      # right part 0


def test_mask_targets_shifted_proposal():
    """A proposal half-overlapping the gt sees the instance shifted."""
    M = 32
    inst = np.ones((1, M, M), np.float32)
    gt = jnp.array([[0., 0., 20., 20.]])
    prop = jnp.array([[10., 0., 30., 20.]])   # right half outside instance
    t = np.asarray(mask_targets_from_instance_masks(
        prop, gt, jnp.asarray(inst), 28)[0])
    assert t[:, :13].mean() > 0.99
    assert t[:, 15:].mean() < 0.01
