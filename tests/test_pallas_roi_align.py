"""Pallas RoIAlign forward — interpret-mode validation vs the XLA gather
reference (compiled-TPU benchmarking is round-2 work)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu.ops.roi_align import multilevel_roi_align
from bonai_tpu.ops.pallas_roi_align import pallas_roi_align


@pytest.mark.parametrize("out_size", [7, 14])
def test_pallas_matches_gather(out_size):
    rng = np.random.RandomState(11)
    B, C = 2, 8
    feats = [jnp.asarray(rng.randn(B, 256 // s, 256 // s, C)
                         .astype(np.float32)) for s in (4, 8, 16, 32)]
    strides = [4, 8, 16, 32]
    R = 8
    ctr = rng.uniform(40, 210, (R, 2))
    sc = rng.uniform(25, 140, (R, 1))
    ar = rng.uniform(0.6, 1.8, (R, 1))
    w = sc * np.sqrt(ar)
    h = sc / np.sqrt(ar)
    boxes = np.concatenate([ctr - np.c_[w, h] / 2,
                            ctr + np.c_[w, h] / 2], 1).clip(0, 256)
    rois = jnp.asarray(np.concatenate(
        [rng.randint(0, B, (R, 1)), boxes], 1), jnp.float32)
    ref = multilevel_roi_align(feats, rois, out_size, strides,
                               sampling_ratio=2)
    got = pallas_roi_align(feats, rois, out_size, strides,
                           sampling_ratio=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_roi_valid():
    feats = [jnp.ones((1, 64, 64, 8)) for _ in range(4)]
    rois = jnp.asarray([[0, 8, 8, 40, 40], [0, 8, 8, 40, 40]], jnp.float32)
    out = pallas_roi_align(feats, rois, 7, [4, 8, 16, 32],
                           roi_valid=jnp.array([True, False]),
                           interpret=True)
    assert float(jnp.abs(out[1]).sum()) == 0
    assert float(jnp.abs(out[0]).sum()) > 0
