"""AutoAugment / Albu / InstaBoost adapters (reference
``auto_augment.py``, ``transforms.py:1211-1355``, ``instaboost.py``)."""

import numpy as np
import pytest

from bonai_tpu.datasets.pipelines import Albu, AutoAugment, InstaBoost


class _SeqRng:
    """randint returns preset values in order; rand always 0."""

    def __init__(self, vals):
        self.vals = list(vals)

    def rand(self):
        return 0.0

    def randint(self, *a, **k):
        return self.vals.pop(0)


def _sample(size=32):
    return dict(img=np.zeros((size, size, 3), np.float32),
                img_shape=(size, size),
                gt_bboxes=np.array([[2.0, 3.0, 10.0, 12.0]], np.float32),
                gt_labels=np.array([0], np.int64),
                gt_offsets=np.array([[1.0, -2.0]], np.float32))


def test_auto_augment_selects_policy():
    aug = AutoAugment(policies=[
        [dict(type="RandomFlip", flip_ratio=1.0, direction="horizontal")],
        [dict(type="Pad", size_divisor=64)],
    ])
    # policy 1: pad to 64
    res = _sample()
    res["_rng"] = _SeqRng([1])
    res = aug(res)
    assert res["img"].shape[:2] == (64, 64)
    # policy 0: horizontal flip moves the box
    res = _sample()
    res["_rng"] = _SeqRng([0, 0])    # policy idx, flip-direction idx
    res = aug(res)
    assert res["img"].shape[:2] == (32, 32)
    np.testing.assert_allclose(res["gt_bboxes"][0], [22.0, 3.0, 30.0, 12.0])


def test_auto_augment_validates_policies():
    with pytest.raises(AssertionError):
        AutoAugment(policies=[])
    with pytest.raises(AssertionError):
        AutoAugment(policies=[[{"no_type": 1}]])


def test_albu_adapter_roundtrip_with_injected_compose():
    """The adapter's keymap/bbox marshalling is exercised with an injected
    albumentations-like callable (the real library is not bundled)."""

    def fake_compose(transforms, bbox_params):
        def run(image, bboxes, labels):
            image = image + 1.0
            bboxes = [(x1 + 1, y1 + 1, x2 + 1, y2 + 1)
                      for (x1, y1, x2, y2) in bboxes]
            return dict(image=image, bboxes=bboxes, labels=labels)
        return lambda **kw: run(**kw)

    t = Albu(transforms=[dict(type="ShiftScaleRotate", p=1.0)],
             _compose_factory=fake_compose)
    res = t(_sample())
    np.testing.assert_allclose(res["gt_bboxes"][0], [3.0, 4.0, 11.0, 13.0])
    assert res["img"][0, 0, 0] == 1.0
    assert res["gt_labels"].dtype == np.int64


def test_albu_skip_img_without_anno():
    def drop_all(transforms, bbox_params):
        return lambda **kw: dict(image=kw["image"], bboxes=[],
                                 labels=[])
    t = Albu(transforms=[], skip_img_without_anno=True,
             _compose_factory=drop_all)
    assert t(_sample()) is None     # upstream retries another sample


def test_albu_and_instaboost_raise_without_dependency():
    with pytest.raises(ImportError, match="albumentations"):
        Albu(transforms=[dict(type="Blur", p=1.0)])
    with pytest.raises(ImportError, match="instaboostfast"):
        InstaBoost()
