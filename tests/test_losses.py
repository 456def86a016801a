import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu.models.losses import (CrossEntropyLoss, SmoothL1Loss, L1Loss,
                                     MSELoss, FocalLoss, GIoULoss, IoULoss,
                                     DIoULoss, cross_entropy,
                                     binary_cross_entropy, build_loss)


def test_cross_entropy_known_value():
    logits = jnp.array([[2.0, 0.0], [0.0, 2.0]])
    labels = jnp.array([0, 0])
    loss = cross_entropy(logits, labels)
    expect = np.mean([-np.log(np.exp(2) / (np.exp(2) + 1)),
                      -np.log(1 / (np.exp(2) + 1))])
    assert abs(float(loss) - expect) < 1e-5


def test_bce_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    logits = rng.randn(8, 4).astype(np.float32)
    labels = (rng.rand(8, 4) > 0.5).astype(np.float32)
    ours = binary_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    theirs = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(labels)).item()
    assert abs(float(ours) - theirs) < 5e-5   # fp32 reduction-order noise


def test_smooth_l1_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(1)
    a = rng.randn(16).astype(np.float32) * 3
    b = rng.randn(16).astype(np.float32)
    ours = SmoothL1Loss(beta=1.0)(jnp.asarray(a), jnp.asarray(b))
    theirs = F.smooth_l1_loss(torch.tensor(a), torch.tensor(b)).item()
    assert abs(float(ours) - theirs) < 1e-5


def test_weighted_avg_factor():
    pred = jnp.array([1.0, 2.0, 3.0, 4.0])
    target = jnp.zeros(4)
    w = jnp.array([1.0, 1.0, 0.0, 0.0])
    loss = L1Loss()(pred, target, weight=w)   # mean over weight sum
    assert abs(float(loss) - 1.5) < 1e-6
    loss = L1Loss()(pred, target, weight=w, avg_factor=4)
    assert abs(float(loss) - 0.75) < 1e-6


def test_mask_loss_use_mask():
    loss_fn = CrossEntropyLoss(use_mask=True)
    logits = jnp.zeros((2, 4, 4))
    target = jnp.ones((2, 4, 4))
    w = jnp.array([1.0, 0.0])
    out = loss_fn(logits, target, weight=w,
                  avg_factor=1 * 16)
    assert abs(float(out) - np.log(2)) < 1e-5


def test_focal_loss_reduces_easy_examples():
    logits = jnp.array([[5.0], [0.0]])
    labels = jnp.array([[1.0], [1.0]])
    fl = FocalLoss()(logits, labels)
    assert float(fl) < 0.2


def test_giou_perfect_box_zero():
    b = jnp.array([[0., 0., 10., 10.]])
    assert abs(float(GIoULoss()(b, b))) < 1e-5
    assert abs(float(IoULoss(linear=True)(b, b))) < 1e-5
    assert abs(float(DIoULoss()(b, b))) < 1e-5
    b2 = jnp.array([[20., 20., 30., 30.]])
    assert float(GIoULoss()(b, b2)) > 1.0   # disjoint -> >1


def test_loss_registry():
    fn = build_loss(dict(type="SmoothL1Loss", loss_weight=16.0))
    assert abs(float(fn(jnp.ones(2) * 2, jnp.zeros(2))) - 16 * 1.5) < 1e-5


def test_ciou_identical_boxes_zero():
    from bonai_tpu.models.losses import build_loss
    loss = build_loss(dict(type="CIoULoss"))
    b = jnp.asarray([[0., 0., 10., 10.], [5., 5., 20., 30.]])
    assert float(loss(b, b)) < 1e-5
    worse = build_loss(dict(type="CIoULoss"))(
        jnp.asarray([[0., 0., 10., 10.]]), jnp.asarray([[5., 5., 15., 15.]]))
    assert float(worse) > 0.1


def test_gaussian_focal_hand_math():
    from bonai_tpu.models.losses import build_loss
    loss = build_loss(dict(type="GaussianFocalLoss", alpha=2.0, gamma=4.0,
                           reduction="none"))
    pred = jnp.asarray([0.9, 0.2])
    target = jnp.asarray([1.0, 0.5])
    got = np.asarray(loss(pred, target))
    exp0 = -np.log(0.9 + 1e-12) * (1 - 0.9) ** 2
    exp1 = -np.log(1 - 0.2 + 1e-12) * 0.2 ** 2 * (1 - 0.5) ** 4
    np.testing.assert_allclose(got, [exp0, exp1], rtol=1e-5)


def test_quality_focal_hand_math():
    from bonai_tpu.models.losses import build_loss
    loss = build_loss(dict(type="QualityFocalLoss", beta=2.0,
                           reduction="none"))
    pred = jnp.asarray([[2.0, -1.0]])           # 2 classes
    labels = jnp.asarray([0])                   # positive for class 0
    score = jnp.asarray([0.7])
    got = float(np.asarray(loss(pred, (labels, score)))[0])

    def bce(x, t):
        return max(x, 0) - x * t + np.log1p(np.exp(-abs(x)))
    s0, s1 = 1 / (1 + np.exp(-2.0)), 1 / (1 + np.exp(1.0))
    exp = bce(2.0, 0.7) * abs(0.7 - s0) ** 2 + bce(-1.0, 0.0) * s1 ** 2
    np.testing.assert_allclose(got, exp, rtol=1e-5)
    # background sample: pure all-negative focal term
    got_bg = float(np.asarray(loss(pred, (jnp.asarray([2]), score)))[0])
    exp_bg = bce(2.0, 0.0) * s0 ** 2 + bce(-1.0, 0.0) * s1 ** 2
    np.testing.assert_allclose(got_bg, exp_bg, rtol=1e-5)


def test_distribution_focal_hand_math():
    from bonai_tpu.models.losses import build_loss
    loss = build_loss(dict(type="DistributionFocalLoss", reduction="none"))
    pred = jnp.asarray([[1.0, 2.0, 0.5, -1.0]])
    target = jnp.asarray([1.3])
    logp = np.log(np.exp([1.0, 2.0, 0.5, -1.0])
                  / np.exp([1.0, 2.0, 0.5, -1.0]).sum())
    exp = -(logp[1] * 0.7 + logp[2] * 0.3)
    np.testing.assert_allclose(float(np.asarray(loss(pred, target))[0]),
                               exp, rtol=1e-5)


def test_ae_loss_pull_push():
    from bonai_tpu.models.losses import build_loss
    loss = build_loss(dict(type="AssociativeEmbeddingLoss",
                           pull_weight=1.0, push_weight=1.0))
    tl = jnp.asarray([1.0, 5.0, 99.0])
    br = jnp.asarray([1.0, 5.0, -99.0])
    valid = jnp.asarray([True, True, False])
    pull, push = loss(tl, br, valid)
    assert float(pull) < 1e-6            # identical pairs: no pull
    assert float(push) < 1e-6            # means 1 and 5 far apart: no push
    tl2 = jnp.asarray([1.0, 1.2, 0.0])
    br2 = jnp.asarray([1.0, 1.2, 0.0])
    _, push2 = loss(tl2, br2, valid)
    assert float(push2) > 0.3            # close means are pushed
