"""IoU-balanced / instance-balanced / Score-HLR samplers (reference
``mmdet/core/bbox/samplers/{iou_balanced_neg_sampler,
instance_balanced_pos_sampler,score_hlr_sampler}.py``)."""

import jax
import jax.numpy as jnp
import numpy as np

from bonai_tpu.core.samplers import (instance_balanced_pos_sample,
                                     iou_balanced_neg_sample,
                                     score_hlr_neg_sample)


def _mk_assigned(n=256, n_pos=20, n_gt=4, seed=0):
    r = np.random.RandomState(seed)
    assigned = np.zeros(n, np.int32)
    pos_idx = r.choice(n, n_pos, replace=False)
    assigned[pos_idx] = r.randint(1, n_gt + 1, n_pos)
    iou = np.clip(r.rand(n) * 0.3, 0, 1)           # negatives: low IoU
    iou[pos_idx] = r.uniform(0.5, 1.0, n_pos)
    return jnp.asarray(assigned), jnp.asarray(iou.astype(np.float32))


def _invariants(res, assigned, num, num_pos_cap):
    res = {k: np.asarray(v) for k, v in res.items()}
    assigned = np.asarray(assigned)
    assert res["inds"].shape == (num,)
    # positives first (detector slices pos slots from the front)
    first_neg = np.argmax(~res["is_pos"]) if not res["is_pos"].all() \
        else num
    assert not res["is_pos"][first_neg:].any()
    assert res["is_pos"].sum() <= num_pos_cap
    # every selected positive really is assigned > 0, negatives == 0
    sel = res["inds"][res["valid"]]
    is_pos_sel = res["is_pos"][res["valid"]]
    assert (assigned[sel][is_pos_sel] > 0).all()
    assert (assigned[sel][~is_pos_sel] == 0).all()
    # no duplicate candidate indices among valid slots
    assert len(np.unique(sel)) == len(sel)


def test_iou_balanced_invariants_and_bin_spread():
    assigned, iou = _mk_assigned()
    num, pf = 64, 0.25
    res = iou_balanced_neg_sample(jax.random.PRNGKey(0), assigned, iou,
                                  num, pf, floor_thr=0.0,
                                  floor_fraction=0.25, num_bins=3)
    _invariants(res, assigned, num, int(num * pf))
    # all slots fill (plenty of candidates)
    assert np.asarray(res["valid"]).all()


def test_iou_balanced_prefers_spread_over_random():
    """With bins enabled the selected negatives must cover the high-IoU
    interval far better than their base rate: high-IoU negatives are rare
    in the pool but get a full bin quota."""
    r = np.random.RandomState(1)
    n = 512
    assigned = np.zeros(n, np.int32)
    iou = np.concatenate([r.uniform(0.0, 0.05, n - 24),
                          r.uniform(0.2, 0.3, 24)]).astype(np.float32)
    res = iou_balanced_neg_sample(jax.random.PRNGKey(1),
                                  jnp.asarray(assigned), jnp.asarray(iou),
                                  96, 0.0, floor_thr=0.0,
                                  floor_fraction=0.0, num_bins=3)
    sel = np.asarray(res["inds"])[np.asarray(res["valid"])]
    frac_high = (iou[sel] > 0.1).mean()
    assert frac_high > 0.15        # base rate is 24/512 ≈ 0.047


def test_instance_balanced_even_allocation():
    """One gt has 30 positive candidates, another has 2 — the balanced
    sampler must keep both instances represented instead of letting the
    big one crowd out the small one."""
    n = 256
    assigned = np.zeros(n, np.int32)
    assigned[:30] = 1
    assigned[30:32] = 2
    res = instance_balanced_pos_sample(jax.random.PRNGKey(2),
                                       jnp.asarray(assigned), 32, 0.25)
    _invariants(res, assigned, 32, 8)
    sel = np.asarray(res["inds"])[np.asarray(res["is_pos"])]
    got = np.asarray(assigned)[sel]
    assert (got == 2).sum() == 2           # both rare positives kept
    # quota: round(8/2)+1 = 5 per gt, refill tops gt1 back up to cap
    assert (got == 1).sum() == 6


def test_score_hlr_selects_hard_negatives_and_weights():
    n = 256
    assigned = np.zeros(n, np.int32)
    assigned[:8] = 1
    r = np.random.RandomState(3)
    score = r.uniform(0.0, 0.04, n).astype(np.float32)   # below thr
    hard = np.arange(50, 80)
    score[hard] = r.uniform(0.3, 0.9, len(hard))         # hard negatives
    score[:8] = 0.0
    res = score_hlr_neg_sample(jax.random.PRNGKey(3), jnp.asarray(assigned),
                               jnp.asarray(score), 48, 0.25,
                               score_thr=0.05, bias=0.0, k=0.5)
    _invariants(res, assigned, 48, 12)
    sel = np.asarray(res["inds"])[np.asarray(res["valid"])
                                  & ~np.asarray(res["is_pos"])]
    # every hard negative must be selected before any easy one
    assert set(hard).issubset(set(sel.tolist()))
    w = np.asarray(res["neg_label_weights"])
    assert w.shape == (48,)
    assert (w > 0).all() and np.isfinite(w).all()
    # hardest negative (highest score) gets the largest ISR-N weight
    neg_slots = np.asarray(res["valid"]) & ~np.asarray(res["is_pos"])
    sel_scores = score[np.asarray(res["inds"])]
    hard_slot = np.argmax(np.where(neg_slots, sel_scores, -1))
    assert w[hard_slot] == w[neg_slots].max()


def test_small_candidate_pool_pads():
    assigned = jnp.asarray([1, 0, 0, 2], jnp.int32)
    iou = jnp.asarray([0.9, 0.1, 0.0, 0.8], jnp.float32)
    for res in (
        iou_balanced_neg_sample(jax.random.PRNGKey(0), assigned, iou, 16,
                                0.25),
        instance_balanced_pos_sample(jax.random.PRNGKey(0), assigned, 16,
                                     0.25),
        score_hlr_neg_sample(jax.random.PRNGKey(0), assigned, iou, 16,
                             0.25),
    ):
        assert np.asarray(res["inds"]).shape == (16,)
        assert np.asarray(res["valid"]).sum() <= 4
