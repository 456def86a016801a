"""Native maskops vs numpy reference cross-validation."""

import numpy as np
import pytest

from bonai_tpu import native


@pytest.fixture(scope="module")
def L():
    lib = native.lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def _np_counts(mask):
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    n = flat.size
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    idx = np.concatenate([[0], change, [n]])
    counts = np.diff(idx).tolist()
    if flat[0] == 1:
        counts = [0] + counts
    return counts


def test_native_rle_matches_numpy(L):
    rng = np.random.RandomState(0)
    for shape in [(17, 13), (64, 64), (5, 100)]:
        mask = (rng.rand(*shape) > 0.6).astype(np.uint8)
        got = native.rle_encode_counts(mask)
        assert got == _np_counts(mask)
        back = native.rle_decode_counts(got, *shape)
        np.testing.assert_array_equal(back, mask)


def test_native_rle_iou(L):
    rng = np.random.RandomState(1)
    a = (rng.rand(40, 30) > 0.5).astype(np.uint8)
    b = (rng.rand(40, 30) > 0.5).astype(np.uint8)
    ca = native.rle_encode_counts(a)
    cb = native.rle_encode_counts(b)
    got = native.rle_iou_native(ca, cb)
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    assert abs(got - inter / union) < 1e-9


def test_native_paste_matches_cv2(L):
    import cv2
    rng = np.random.RandomState(2)
    prob = rng.rand(28, 28).astype(np.float32)
    box = (10.3, 5.7, 50.9, 40.2)
    h, w = 64, 72
    out = np.zeros((h, w), np.uint8)
    assert native.paste_mask_native(prob, box, out, 0.5)
    # cv2 reference
    x1, y1 = int(np.floor(box[0])), int(np.floor(box[1]))
    x2, y2 = int(np.ceil(box[2])), int(np.ceil(box[3]))
    resized = cv2.resize(prob, (x2 - x1, y2 - y1),
                         interpolation=cv2.INTER_LINEAR)
    ref = np.zeros((h, w), np.uint8)
    ref[y1:y2, x1:x2] = resized > 0.5
    # bilinear edge rounding may differ on a handful of boundary pixels
    diff = (out != ref).sum()
    assert diff < 0.02 * (y2 - y1) * (x2 - x1), diff


def test_native_fill_poly(L):
    poly = np.array([[2, 2], [20, 2], [20, 15], [2, 15]], np.float32)
    mask = np.zeros((20, 25), np.uint8)
    L.fill_poly(np.ascontiguousarray(poly).ctypes.data, 4,
                mask.ctypes.data, 20, 25)
    assert mask[5, 5] == 1 and mask[0, 0] == 0
    assert abs(int(mask.sum()) - 18 * 13) <= 40


def test_mask_utils_uses_native(L):
    from bonai_tpu.datasets import mask_utils
    rng = np.random.RandomState(3)
    m = (rng.rand(33, 41) > 0.5).astype(np.uint8)
    rle = mask_utils.encode_mask(m)
    np.testing.assert_array_equal(mask_utils.decode_mask(rle), m)
