import numpy as np

from bonai_tpu.datasets.pipelines.transforms import (
    Expand, MinIoURandomCrop, RandomCrop, PhotoMetricDistortion,
    OffsetTransform)


def _sample(n=3, size=64, seed=0):
    rng = np.random.RandomState(seed)
    boxes = []
    masks = []
    for _ in range(n):
        x1, y1 = rng.uniform(5, 30, 2)
        w, h = rng.uniform(10, 20, 2)
        boxes.append([x1, y1, x1 + w, y1 + h])
        masks.append([np.array([[x1, y1], [x1 + w, y1], [x1 + w, y1 + h],
                                [x1, y1 + h]], np.float32)])
    return dict(img=rng.randint(0, 255, (size, size, 3), np.uint8)
                .astype(np.float32),
                img_shape=(size, size),
                gt_bboxes=np.asarray(boxes, np.float32),
                gt_labels=np.zeros(n, np.int64),
                gt_offsets=rng.uniform(-5, 5, (n, 2)).astype(np.float32),
                gt_masks=masks,
                _rng=np.random.RandomState(seed + 1))


def test_expand_keeps_geometry():
    s = _sample()
    before = s["gt_bboxes"].copy()
    out = Expand(prob=1.0, ratio_range=(2, 2))(s)
    assert out["img_shape"] == (128, 128)
    wh_before = before[:, 2:] - before[:, :2]
    wh_after = out["gt_bboxes"][:, 2:] - out["gt_bboxes"][:, :2]
    # pure translation (fp32 ulp slack for x+shift rounding)
    np.testing.assert_allclose(wh_after, wh_before, atol=1e-3)
    # polygons stay inside boxes
    for box, inst in zip(out["gt_bboxes"], out["gt_masks"]):
        for p in inst:
            assert p[:, 0].min() >= box[0] - 1e-3


def test_random_crop_drops_outside_boxes():
    s = _sample(size=64)
    out = RandomCrop((32, 32))(s)
    if out is None:     # all boxes cropped away — valid outcome
        return
    n = len(out["gt_bboxes"])
    assert len(out["gt_masks"]) == n
    assert len(out["gt_offsets"]) == n
    assert out["img"].shape[:2] == (32, 32)
    assert (out["gt_bboxes"] >= 0).all()
    assert (out["gt_bboxes"][:, 0::2] <= 32).all()


def test_min_iou_random_crop_keeps_some_gt():
    s = _sample(size=64, seed=3)
    out = MinIoURandomCrop()(s)
    assert out is not None
    assert len(out["gt_bboxes"]) >= 1


def test_photometric_shapes():
    s = _sample()
    out = PhotoMetricDistortion()(s)
    assert out["img"].shape == (64, 64, 3)
    assert np.isfinite(out["img"]).all()


def test_offset_transform_roundtrip():
    s = _sample()
    orig = s["gt_offsets"].copy()
    s = OffsetTransform("xy2la")(s)
    s = OffsetTransform("la2xy")(s)
    np.testing.assert_allclose(s["gt_offsets"], orig, atol=1e-4)


def test_corruptions_run():
    from bonai_tpu.datasets.pipelines.corrupt import corrupt_image, _SEV
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (32, 32, 3), np.uint8)
    for c in _SEV:
        out = corrupt_image(img, c, severity=3, rng=rng)
        assert out.shape == img.shape, c
        assert np.isfinite(out.astype(np.float64)).all(), c
    # severity monotonicity for noise
    d1 = np.abs(corrupt_image(img, "gaussian_noise", 1,
                              np.random.RandomState(1)).astype(int)
                - img.astype(int)).mean()
    d5 = np.abs(corrupt_image(img, "gaussian_noise", 5,
                              np.random.RandomState(1)).astype(int)
                - img.astype(int)).mean()
    assert d5 > d1


def test_loss_family_extras():
    import jax.numpy as jnp
    from bonai_tpu.models.losses import BalancedL1Loss, GHMC
    p = jnp.asarray([[0.5, -1.0], [2.0, 0.1]])
    t = jnp.zeros((2, 2))
    bl = BalancedL1Loss()(p, t)
    assert np.isfinite(float(bl)) and float(bl) > 0
    assert abs(float(BalancedL1Loss()(t, t))) < 1e-6
    g = GHMC()(p, t, weight=jnp.ones((2, 2)))
    assert np.isfinite(float(g)) and float(g) > 0


def test_seg_rescale():
    from bonai_tpu.datasets.pipelines.transforms import SegRescale
    s = _sample()
    s["gt_semantic_seg"] = np.arange(64 * 64).reshape(64, 64) % 3
    s["gt_semantic_seg"] = s["gt_semantic_seg"].astype(np.uint8)
    out = SegRescale(scale_factor=0.5)(s)
    assert out["gt_semantic_seg"].shape == (32, 32)
    # nearest-neighbour: values come from the original label set
    assert set(np.unique(out["gt_semantic_seg"])) <= {0, 1, 2}


def test_random_center_crop_pad_train():
    from bonai_tpu.datasets.pipelines.transforms import RandomCenterCropPad
    s = _sample(size=64)
    t = RandomCenterCropPad(crop_size=(48, 48), ratios=(1.0,), border=16,
                            mean=(1, 2, 3), to_rgb=False)
    out = t(s)
    assert out["img"].shape[:2] == (48, 48)
    assert out["img_shape"] == (48, 48)
    n = len(out["gt_bboxes"])
    assert len(out["gt_masks"]) == n and len(out["gt_offsets"]) == n
    assert (out["gt_bboxes"] >= 0).all()
    assert (out["gt_bboxes"][:, 0::2] <= 48).all()
    assert (out["gt_bboxes"][:, 1::2] <= 48).all()
    # surviving box centers sit inside the canvas
    ctr = (out["gt_bboxes"][:, :2] + out["gt_bboxes"][:, 2:]) / 2
    assert ((ctr > 0) & (ctr < 48)).all()


def test_random_center_crop_pad_test_mode():
    from bonai_tpu.datasets.pipelines.transforms import RandomCenterCropPad
    s = _sample(size=100)
    s["img"] = np.random.RandomState(0).rand(100, 90, 3).astype(np.float32)
    t = RandomCenterCropPad(crop_size=None, ratios=None, border=None,
                            mean=(0, 0, 0), to_rgb=False, test_mode=True,
                            test_pad_mode=("logical_or", 127))
    out = t(s)
    # 100|127 = 127, 90|127 = 127
    assert out["img"].shape[:2] == (127, 127)
    assert "border" in out
