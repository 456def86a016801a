"""End-to-end TTA: the compiled multi-view step (make_tta_step) is
flip-equivariant — running flip-TTA on a mirrored image yields the same
detections as on the original image.

Reference contract: ``mmdet/datasets/pipelines/test_time_aug.py:9-119``
(view enumeration) + ``merge_augs.py:8-117`` (merge); our views are
generated on device (``apis/test.py:make_tta_step``).
"""

import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from test_models_forward import (tiny_loft_cfg, tiny_train_cfg,
                                 tiny_test_cfg)


@pytest.fixture(scope="module")
def tta_model():
    from bonai_tpu.models import build_detector
    model = build_detector(tiny_loft_cfg(), tiny_train_cfg(),
                           tiny_test_cfg())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, variables


def _det_set(out):
    """Valid detections as a sorted (n, 5) array for set comparison."""
    v = np.asarray(out["det_valid"][0])
    boxes = np.asarray(out["det_bboxes"][0])[v]
    scores = np.asarray(out["det_scores"][0])[v]
    rows = np.concatenate([boxes, scores[:, None]], axis=1)
    return rows[np.lexsort(rows.T)]


def test_flip_tta_of_mirrored_image_matches(tta_model):
    from bonai_tpu.apis.test import make_tta_step
    model, variables = tta_model
    step = make_tta_step(model, flip=True,
                         flip_directions=("horizontal",))
    r = np.random.RandomState(11)
    img = jnp.asarray(r.randn(1, 128, 128, 3), jnp.float32)
    shape = jnp.full((1, 2), 128.0)
    sf = jnp.ones((1,))
    out = step(variables, img, shape, sf)
    out_m = step(variables, jnp.flip(img, axis=2), shape, sf)
    # TTA(img) and TTA(mirror(img)) see the same two views, so after the
    # symmetric merge the mirrored run's detections are the mirror of the
    # original run's.
    a = _det_set(out)
    b = _det_set(out_m)
    assert len(a) == len(b) and len(a) > 0
    b_back = b.copy()
    b_back[:, 0] = 128.0 - b[:, 2]
    b_back[:, 2] = 128.0 - b[:, 0]
    b_back = b_back[np.lexsort(b_back.T)]
    np.testing.assert_allclose(a, b_back, rtol=1e-3, atol=0.1)
    # offsets mirror too (x negated)
    va, vb = np.asarray(out["det_valid"][0]), np.asarray(out_m["det_valid"][0])
    oa = np.asarray(out["offsets"][0])[va]
    ob = np.asarray(out_m["offsets"][0])[vb]
    sa = np.asarray(out["det_scores"][0])[va]
    sb = np.asarray(out_m["det_scores"][0])[vb]
    np.testing.assert_allclose(np.sort(sa), np.sort(sb), atol=1e-4)
    ia, ib = np.argsort(sa), np.argsort(sb)
    np.testing.assert_allclose(oa[ia, 0], -ob[ib, 0], rtol=1e-3, atol=0.1)
    np.testing.assert_allclose(oa[ia, 1], ob[ib, 1], rtol=1e-3, atol=0.1)


def test_multiscale_tta_runs(tta_model):
    from bonai_tpu.apis.test import make_tta_step
    model, variables = tta_model
    step = make_tta_step(model, scales=(1.0, 0.5), flip=False)
    r = np.random.RandomState(5)
    img = jnp.asarray(r.randn(1, 128, 128, 3), jnp.float32)
    out = step(variables, img, jnp.full((1, 2), 128.0), jnp.ones((1,)))
    assert np.asarray(out["det_valid"]).any()
    # merged boxes live in the original frame
    assert float(jnp.max(out["det_bboxes"])) <= 128.0 + 1e-3


def test_tta_cfg_from_pipeline_default_and_declared(tmp_path):
    from bonai_tpu.apis.test import tta_cfg_from_pipeline
    from helpers import make_bonai_dataset
    from bonai_tpu.datasets import build_dataset
    jp, imgd = make_bonai_dataset(str(tmp_path), num_images=1, size=64,
                                  buildings_per_img=1)
    base = dict(type="BONAI", ann_file=jp, img_prefix=imgd, test_mode=True,
                bbox_type="building", mask_type="roof")
    plain = build_dataset(dict(base, pipeline=[
        dict(type="LoadImageFromFile"), dict(type="Collect", keys=["img"])]))
    cfg = tta_cfg_from_pipeline(plain)
    assert cfg["flip"] and set(cfg["flip_directions"]) == {
        "horizontal", "vertical"}
    declared = build_dataset(dict(base, pipeline=[
        dict(type="LoadImageFromFile"),
        dict(type="MultiScaleFlipAug", img_scale=(64, 64), flip=True,
             flip_direction=["horizontal"],
             transforms=[dict(type="Collect", keys=["img"])])]))
    cfg = tta_cfg_from_pipeline(declared)
    assert cfg == dict(scales=[1.0], flip=True,
                       flip_directions=["horizontal"])
