"""PISA losses: ISR-P reweighting + CARL (reference
``mmdet/models/losses/pisa_loss.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu.models.losses import carl_loss, isr_p


def test_isr_p_ranks_by_iou_and_preserves_loss_sum():
    """Three positives of one class/instance with IoUs 0.9 > 0.6 > 0.3:
    ISR-P must weight them in that order, and the reweighted positive
    cls loss must keep its original sum (reference :100-113)."""
    n = 6
    labels = jnp.asarray([0, 0, 0, 1, 1, 1], jnp.int32)  # nc=1, bg=1
    pos_mask = labels < 1
    ious = jnp.asarray([0.9, 0.6, 0.3, 0.0, 0.0, 0.0])
    matched_gt = jnp.zeros(n, jnp.int32)
    lw = jnp.ones(n)
    ce = jnp.asarray([1.0, 2.0, 0.5, 0.0, 0.0, 0.0])
    out = np.asarray(isr_p(lw, ious, pos_mask, labels, matched_gt, ce,
                           k=2.0, bias=0.0))
    # ordering by IoU-HLR
    assert out[0] > out[1] > out[2] > 0
    # negatives untouched
    np.testing.assert_allclose(out[3:], 1.0)
    # loss-sum preservation
    ce_np = np.asarray(ce)
    np.testing.assert_allclose((ce_np * out)[:3].sum(), ce_np[:3].sum(),
                               rtol=1e-5)


def test_isr_p_hierarchical_two_instances():
    """Two instances: within each instance ranks are local, then merged —
    the best sample of a small instance must outrank the 2nd-best of a
    big one at equal IoU (the 'local rank' part of IoU-HLR)."""
    labels = jnp.asarray([0, 0, 0, 0, 1], jnp.int32)
    pos_mask = labels < 1
    #             gt0 best, gt0 2nd, gt1 best, gt1 2nd
    ious = jnp.asarray([0.8, 0.7, 0.5, 0.4, 0.0])
    matched_gt = jnp.asarray([0, 0, 1, 1, 0], jnp.int32)
    lw = jnp.ones(5)
    ce = jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.0])
    out = np.asarray(isr_p(lw, ious, pos_mask, labels, matched_gt, ce,
                           k=1.0, bias=0.0))
    # both instance-best samples outrank both instance-2nd samples
    assert min(out[0], out[2]) > max(out[1], out[3])


def test_isr_p_no_positives_is_identity():
    labels = jnp.full((4,), 1, jnp.int32)
    out = isr_p(jnp.ones(4), jnp.zeros(4), labels < 1, labels,
                jnp.zeros(4, jnp.int32), jnp.zeros(4))
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_carl_weights_follow_cls_score():
    """Higher-confidence positives get larger regression weights; weights
    are normalised to sum to num_pos (reference :160-166)."""
    pos_prob = jnp.asarray([0.9, 0.1, 0.5, 0.0])
    pos_mask = jnp.asarray([True, True, False, False])
    reg = jnp.ones((4, 4))
    k, bias = 1.0, 0.2
    loss = float(carl_loss(pos_prob, pos_mask, reg, k=k, bias=bias,
                           avg_factor=4.0))
    w = np.asarray((bias + (1 - bias) * pos_prob) ** k)
    w = w * (2.0 / w[:2].sum())
    expect = (w[:2, None] * np.ones((2, 4))).sum() / 4.0
    np.testing.assert_allclose(loss, expect, rtol=1e-5)
    # no positives -> zero loss
    assert float(carl_loss(pos_prob, jnp.zeros(4, bool), reg)) == 0.0


def test_pisa_wiring_in_detector():
    """train_cfg.rcnn.isr/carl activates ISR-P + CARL in the RoI loss
    (reference PISARoIHead semantics keyed off the same cfg)."""
    from bonai_tpu.models import build_detector
    from test_models_forward import (demo_batch, tiny_loft_cfg,
                                     tiny_test_cfg, tiny_train_cfg)
    tc = tiny_train_cfg()
    tc["rcnn"]["isr"] = dict(k=2.0, bias=0.0)
    tc["rcnn"]["carl"] = dict(k=1.0, bias=0.2, loss_weight=1.0)
    model = build_detector(tiny_loft_cfg(), tc, tiny_test_cfg())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    losses = model.apply(variables, demo_batch(0), method="forward_train",
                         rngs={"sampling": jax.random.PRNGKey(2)})
    assert "loss_carl" in losses
    for k_, v in losses.items():
        assert np.isfinite(float(v)), k_
    assert float(losses["loss_carl"]) > 0.0


def test_isr_p_cross_image_instances_stay_separate():
    """Same gt index in two different images must form two IoU-HLR
    groups once ids are image-offset (reference pisa_loss.py:47-56;
    regression for the flat-batch collision)."""
    labels = jnp.asarray([0, 0, 0, 0], jnp.int32)
    pos_mask = jnp.ones(4, bool)
    # img A gt0: 0.8, 0.7 ; img B gt0: 0.6, 0.5
    ious = jnp.asarray([0.8, 0.7, 0.6, 0.5])
    lw = jnp.ones(4)
    ce = jnp.ones(4)
    # collided ids (pre-fix behaviour): one 4-sample group
    collided = np.asarray(isr_p(lw, ious, pos_mask, labels,
                                jnp.asarray([0, 0, 0, 0], jnp.int32), ce,
                                k=1.0, bias=0.0))
    # offset ids: two 2-sample groups -> B's best gets a top local rank
    separate = np.asarray(isr_p(lw, ious, pos_mask, labels,
                                jnp.asarray([0, 0, 5, 5], jnp.int32), ce,
                                k=1.0, bias=0.0))
    # with separate instances, each image's best sample shares the top
    # local rank; sample 2 (img B best) must outrank sample 1 (img A 2nd)
    assert separate[2] > separate[1]
    # in the collided grouping sample 2 is merely 3rd of 4
    assert collided[2] < collided[1]
