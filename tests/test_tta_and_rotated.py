import jax.numpy as jnp
import numpy as np

from bonai_tpu.apis.test import flip_device_result, merge_flip_tta
from bonai_tpu.core.anchors import RAnchorGenerator
from bonai_tpu.core.boxes import DeltaRBBoxCoder


def test_flip_device_result_roundtrip():
    out = {
        "det_bboxes": jnp.asarray([[[10., 20., 30., 40.]]]),
        "det_scores": jnp.asarray([[0.9]]),
        "det_labels": jnp.zeros((1, 1), jnp.int32),
        "det_valid": jnp.ones((1, 1), bool),
        "mask_probs": jnp.asarray(np.random.rand(1, 1, 4, 4)),
        "offsets": jnp.asarray([[[3., -5.]]]),
    }
    shape = jnp.asarray([[100., 200.]])     # (h, w)
    f = flip_device_result(out, shape, "horizontal")
    np.testing.assert_allclose(np.asarray(f["det_bboxes"][0, 0]),
                               [200 - 30, 20, 200 - 10, 40])
    np.testing.assert_allclose(np.asarray(f["offsets"][0, 0]), [-3., -5.])
    # double flip restores
    f2 = flip_device_result(f, shape, "horizontal")
    np.testing.assert_allclose(np.asarray(f2["det_bboxes"]),
                               np.asarray(out["det_bboxes"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f2["mask_probs"]),
                               np.asarray(out["mask_probs"]), atol=1e-6)


def test_merge_flip_tta_dedups():
    base = {
        "det_bboxes": jnp.asarray([[[0., 0., 10., 10.],
                                    [50., 50., 60., 60.]]]),
        "det_scores": jnp.asarray([[0.9, 0.7]]),
        "det_labels": jnp.zeros((1, 2), jnp.int32),
        "det_valid": jnp.ones((1, 2), bool),
        "offsets": jnp.zeros((1, 2, 2)),
    }
    # the flipped view found the same first box (slightly jittered) plus
    # one new detection
    other = {
        "det_bboxes": jnp.asarray([[[0.5, 0., 10.5, 10.],
                                    [100., 100., 120., 120.]]]),
        "det_scores": jnp.asarray([[0.85, 0.6]]),
        "det_labels": jnp.zeros((1, 2), jnp.int32),
        "det_valid": jnp.ones((1, 2), bool),
        "offsets": jnp.zeros((1, 2, 2)),
    }
    merged = merge_flip_tta(base, other, iou_thr=0.5, max_per_img=4)
    v = np.asarray(merged["det_valid"][0])
    assert v.sum() == 3     # duplicate suppressed, union kept
    np.testing.assert_allclose(np.asarray(merged["det_scores"][0])[:3],
                               [0.9, 0.7, 0.6], atol=1e-6)


def test_ranchor_generator():
    gen = RAnchorGenerator(strides=[8], ratios=[1.0], scales=[4],
                           angles=[0, 45, 90])
    base = gen.base_anchors[0]
    assert base.shape == (3, 5)
    np.testing.assert_allclose(base[0], [0, 0, 32, 32, 0], atol=1e-5)
    assert abs(base[1][4] - np.deg2rad(45)) < 1e-6
    anchors = gen.grid_anchors([(2, 2)])[0]
    assert anchors.shape == (2 * 2 * 3, 5)
    np.testing.assert_allclose(anchors[3][:2], [8, 0], atol=1e-5)


def test_delta_rbbox_coder_roundtrip():
    rng = np.random.RandomState(0)
    props = np.stack([rng.uniform(50, 200, 16), rng.uniform(50, 200, 16),
                      rng.uniform(10, 60, 16), rng.uniform(10, 60, 16),
                      rng.uniform(-1, 1, 16)], -1).astype(np.float32)
    gts = props + np.stack(
        [rng.uniform(-5, 5, 16), rng.uniform(-5, 5, 16),
         rng.uniform(-2, 2, 16), rng.uniform(-2, 2, 16),
         rng.uniform(-0.2, 0.2, 16)], -1).astype(np.float32)
    coder = DeltaRBBoxCoder()
    d = coder.encode(jnp.asarray(props), jnp.asarray(gts))
    rec = coder.decode(jnp.asarray(props), d)
    np.testing.assert_allclose(np.asarray(rec), gts, rtol=1e-4, atol=1e-3)
