"""Arbitrary-angle RandomRotate (reference ``transforms.py:1836-2094``
``choice`` str path) — consistency with the exact k*90 path and
geometric invariants."""

import math

import numpy as np

from bonai_tpu.datasets.pipelines.transforms import RandomRotate


class _FixedRng:
    """Deterministic: always rotate, always pick angle index 0."""

    def rand(self):
        return 0.0

    def randint(self, n):
        return 0


def _mk_results(size=64, seed=0):
    r = np.random.RandomState(seed)
    img = np.zeros((size, size, 3), np.float32)
    img[20:36, 24:44] = 1.0
    boxes = np.array([[24.0, 20.0, 44.0, 36.0]], np.float32)
    polys = [[np.array([[24.0, 20.0], [44.0, 20.0], [44.0, 36.0],
                        [24.0, 36.0]], np.float32)]]
    offsets = np.array([[6.0, -3.0]], np.float32)
    field = r.uniform(-5, 5, (size, size, 2)).astype(np.float32)
    return dict(img=img, img_shape=(size, size), gt_bboxes=boxes.copy(),
                gt_footprint_bboxes=boxes.copy(), gt_masks=polys,
                gt_offsets=offsets.copy(), gt_offset_field=field.copy(),
                offset_field_fields=["gt_offset_field"], _rng=_FixedRng())


def test_general_path_matches_exact_90():
    exact = RandomRotate(rotate_ratio=1.0, angles=[90])(_mk_results())
    gen = _mk_results()
    rot = RandomRotate(rotate_ratio=1.0, angles=[90])
    gen = rot._rotate_general(gen, 90)
    np.testing.assert_allclose(gen["gt_bboxes"], exact["gt_bboxes"],
                               atol=1.0)
    np.testing.assert_allclose(gen["gt_offsets"], exact["gt_offsets"],
                               atol=1e-5)
    # image content matches up to interpolation at the crop border
    diff = np.abs(gen["img"] - exact["img"]).mean()
    assert diff < 0.02


def test_arbitrary_angle_box_covers_rotated_content():
    """After a 30° rotation the gt box must be the AABB of the rotated
    rectangle: it covers every warped nonzero pixel, tightly."""
    res = _mk_results()
    res = RandomRotate(rotate_ratio=1.0, angles=[30])(res)
    ys, xs = np.nonzero(res["img"][..., 0] > 0.5)
    x1, y1, x2, y2 = res["gt_bboxes"][0]
    assert x1 <= xs.min() + 1.5 and xs.max() - 1.5 <= x2
    assert y1 <= ys.min() + 1.5 and ys.max() - 1.5 <= y2
    assert (x2 - x1) < (xs.max() - xs.min()) + 5
    # polygon mask points transformed with the same affine
    poly = res["gt_masks"][0][0]
    assert poly[:, 0].min() >= x1 - 1e-3 and poly[:, 0].max() <= x2 + 1e-3
    # footprint boxes ride the same transform
    np.testing.assert_allclose(res["gt_footprint_bboxes"],
                               res["gt_bboxes"], atol=1e-5)


def test_arbitrary_angle_offset_magnitude_preserved():
    res = _mk_results()
    before = np.linalg.norm(res["gt_offsets"][0])
    res = RandomRotate(rotate_ratio=1.0, angles=[37])(res)
    after = np.linalg.norm(res["gt_offsets"][0])
    np.testing.assert_allclose(after, before, rtol=1e-5)
    # rotation by a then by 360-a restores the original vector
    res2 = RandomRotate(rotate_ratio=1.0, angles=[360 - 37])(
        dict(res, _rng=_FixedRng()))
    np.testing.assert_allclose(res2["gt_offsets"][0], [6.0, -3.0],
                               atol=1e-4)


def test_offset_field_vector_rotation():
    """The dense field rotates both spatially and vector-wise; magnitudes
    inside the valid region are preserved (reference
    ``offset_field_rotate``)."""
    res = _mk_results()
    mag_before = np.sort(
        np.linalg.norm(res["gt_offset_field"], axis=-1), axis=None)
    res = RandomRotate(rotate_ratio=1.0, angles=[90])(res)
    f = res["gt_offset_field"]
    assert f.shape == (64, 64, 2)
    mag_after = np.sort(np.linalg.norm(f, axis=-1), axis=None)
    np.testing.assert_allclose(mag_after, mag_before, rtol=1e-4)


def test_angles_any_draws_from_full_circle():
    rot = RandomRotate(rotate_ratio=1.0, angles="any")
    assert len(rot.angles) == 360
