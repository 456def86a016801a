"""Proposal-level TTA (``TwoStageDetector.aug_test`` — the analog of
reference ``two_stage.py:201-211`` + ``merge_augs.py:8-117``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu.models import build_detector

from test_models_forward import (tiny_loft_cfg, tiny_test_cfg,
                                 tiny_train_cfg)


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_detector(tiny_loft_cfg(), tiny_train_cfg(),
                           tiny_test_cfg())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    b, size = 1, 128
    img = jnp.asarray(np.random.RandomState(7).randn(
        b, size, size, 3).astype(np.float32))
    shp = jnp.full((b, 2), float(size))
    sf = jnp.ones((b,))
    return model, variables, img, shp, sf


def _valid_set(out, decimals=2):
    v = np.asarray(out["det_valid"][0])
    bx = np.round(np.asarray(out["det_bboxes"][0])[v], decimals)
    sc = np.round(np.asarray(out["det_scores"][0])[v], decimals + 1)
    return {tuple(b) + (s,) for b, s in zip(bx.tolist(), sc.tolist())}


def test_single_view_aug_test_matches_simple_test(model_and_vars):
    """With one unflipped view at scale 1, the proposal-merge path almost
    reduces to simple_test; the residual difference is reference-correct:
    ``merge_aug_proposals`` re-runs PLAIN NMS over the pooled proposals
    (``merge_augs.py:39-41``) whereas the RPN's internal NMS is
    level-offset (boxes from different FPN levels never suppress each
    other), so a few cross-level near-duplicates are merged away."""
    model, variables, img, shp, sf = model_and_vars
    simple = model.apply(variables, img, shp, sf, method="simple_test")
    aug = model.apply(variables, img, shp, sf, method="aug_test",
                      scales=(1.0,), flip_directions=(None,))
    s_set, a_set = _valid_set(simple), _valid_set(aug)
    common = s_set & a_set
    assert len(common) >= max(2, int(0.6 * len(s_set)))
    assert len(s_set.symmetric_difference(a_set)) <= 4
    # offsets merge too (single view → identical values for shared dets)
    assert aug["offsets"].shape == simple["offsets"].shape


def test_flip_views_merge_finite_and_shaped(model_and_vars):
    model, variables, img, shp, sf = model_and_vars
    out = model.apply(variables, img, shp, sf, method="aug_test",
                      scales=(1.0,), flip_directions=(None, "horizontal",
                                                      "vertical"))
    p = int(tiny_test_cfg()["rcnn"]["max_per_img"])
    assert out["det_bboxes"].shape == (1, p, 4)
    assert out["mask_probs"].shape[:2] == (1, p)
    assert out["offsets"].shape == (1, p, 2)
    for k in ("det_bboxes", "det_scores", "offsets", "mask_probs"):
        assert np.all(np.isfinite(np.asarray(out[k]))), k
    # merged mask probabilities stay probabilities
    mp = np.asarray(out["mask_probs"])
    assert mp.min() >= 0.0 and mp.max() <= 1.0


def test_flip_symmetry_of_aug_test(model_and_vars):
    """aug_test over {id, hflip} of a mirrored image equals the mirrored
    aug_test of the original: the view set is closed under the flip, so
    the merged detections must be equivariant."""
    model, variables, img, shp, sf = model_and_vars
    out = model.apply(variables, img, shp, sf, method="aug_test",
                      scales=(1.0,), flip_directions=(None, "horizontal"))
    img_m = jnp.flip(img, 2)
    out_m = model.apply(variables, img_m, shp, sf, method="aug_test",
                        scales=(1.0,), flip_directions=(None, "horizontal"))
    w = float(shp[0, 1])
    v = np.asarray(out["det_valid"][0])
    bx = np.asarray(out["det_bboxes"][0])[v]
    mirrored = np.stack([w - bx[:, 2], bx[:, 1], w - bx[:, 0], bx[:, 3]],
                        -1)
    v_m = np.asarray(out_m["det_valid"][0])
    bx_m = np.asarray(out_m["det_bboxes"][0])[v_m]
    got = {tuple(x) for x in np.round(bx_m, 1).tolist()}
    want = {tuple(x) for x in np.round(mirrored, 1).tolist()}
    # allow NMS tie-break noise on at most one box
    assert len(got.symmetric_difference(want)) <= 2
