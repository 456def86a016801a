"""Fixed-size random pos/neg sampling.

reference: ``mmdet/core/bbox/samplers/random_sampler.py:31-75`` +
``sampling_result.py:1-152``.  The reference gathers a dynamic number of
indices per image; here sampling is a static-shape top-k over random keys:

- positives: top ``num_expected_pos`` boxes by ``is_pos * (1 + u)``
- negatives fill the remaining slots of the fixed ``num``-sized output

which reproduces the reference behaviour (cap positives at
``num * pos_fraction``, fill the rest with random negatives) without any
dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_sample(rng, assigned_gt_inds, num, pos_fraction, neg_pos_ub=-1,
                  _pos_cap=None):
    """Sample a fixed ``num`` of candidates from an assignment vector.

    Args:
      rng: PRNG key.
      assigned_gt_inds: ``(N,)`` int32 from :func:`max_iou_assign`.
      num: total samples (static).
      pos_fraction: max fraction of positives.

    Returns dict with static shapes:
      inds: ``(num,)`` indices into the candidate set (padded slots point at 0)
      is_pos: ``(num,)`` bool — slot holds a sampled positive
      valid: ``(num,)`` bool — slot holds a real sample (pos or neg)
      pos_gt_inds: ``(num,)`` int32 0-based matched-gt index for pos slots
    """
    n = assigned_gt_inds.shape[0]
    if num > n:
        # fewer candidates than the requested sample size (tiny configs):
        # sample all candidates and pad the outputs to `num`; the positive
        # cap stays num*pos_fraction of the ORIGINAL num
        inner = random_sample(rng, assigned_gt_inds, n, pos_fraction,
                              neg_pos_ub,
                              _pos_cap=min(int(num * pos_fraction), n))
        pad = num - n
        return {k: jnp.pad(v, (0, pad)) for k, v in inner.items()}
    num_expected_pos = (int(num * pos_fraction) if _pos_cap is None
                        else _pos_cap)
    is_pos = assigned_gt_inds > 0
    is_neg = assigned_gt_inds == 0

    rng_pos, rng_neg = jax.random.split(rng)
    u_pos = jax.random.uniform(rng_pos, (n,), minval=1e-4, maxval=1.0)
    u_neg = jax.random.uniform(rng_neg, (n,), minval=1e-4, maxval=1.0)

    pos_key = jnp.where(is_pos, 1.0 + u_pos, 0.0)
    _, pos_sel = jax.lax.top_k(pos_key, num_expected_pos)
    # mark which candidates were chosen as positives
    chosen_pos = jnp.zeros(n, bool).at[pos_sel].set(True) & is_pos

    # negatives may also be capped by neg_pos_ub (unused in BONAI configs,
    # where neg_pos_ub = -1); we implement the common -1 path plus the cap.
    if neg_pos_ub > 0:
        # cap negatives at neg_pos_ub * num_pos — approximated with the
        # static bound neg_pos_ub * num_expected_pos (rarely binding).
        max_neg = neg_pos_ub * num_expected_pos
    else:
        max_neg = num

    neg_key = jnp.where(is_neg, u_neg, 0.0)
    _, neg_rank_sel = jax.lax.top_k(neg_key, min(max_neg, num))
    chosen_neg_rank = jnp.zeros(n, bool).at[neg_rank_sel].set(True) & is_neg

    # final ranking: chosen positives first, then randomly-ranked negatives
    final_key = jnp.where(chosen_pos, 2.0 + u_pos,
                          jnp.where(chosen_neg_rank, u_neg, 0.0))
    key_vals, inds = jax.lax.top_k(final_key, num)
    valid = key_vals > 0.0
    is_pos_out = key_vals > 2.0
    pos_gt_inds = jnp.maximum(assigned_gt_inds[inds] - 1, 0)
    return {
        "inds": inds,
        "is_pos": is_pos_out & valid,
        "valid": valid,
        "pos_gt_inds": pos_gt_inds,
    }


def ohem_sample(loss, assigned_gt_inds, num, pos_fraction, neg_pos_ub=-1,
                _pos_cap=None):
    """Online Hard Example Mining: like :func:`random_sample` but ranked
    by per-candidate loss instead of random keys.

    reference: ``mmdet/core/bbox/samplers/ohem_sampler.py`` — positives
    beyond the cap and all negatives are chosen by descending
    classification loss (``hard_mining``: no-grad bbox-head forward,
    ``loss.topk``).  Static-shape TPU version: the loss is squashed to
    (0, 1) and used as the top-k ranking key in the same banded scheme
    as the random sampler (chosen positives 2+key > negatives key > 0).

    Args:
      loss: ``(N,)`` float32 per-candidate loss (already stop-gradiented).
      assigned_gt_inds: ``(N,)`` int32 from :func:`max_iou_assign`.
    Returns the same static-shape dict as :func:`random_sample`.
    """
    n = assigned_gt_inds.shape[0]
    if num > n:
        inner = ohem_sample(loss, assigned_gt_inds, n, pos_fraction,
                            neg_pos_ub,
                            _pos_cap=min(int(num * pos_fraction), n))
        return {k: jnp.pad(v, (0, num - n)) for k, v in inner.items()}
    num_expected_pos = (int(num * pos_fraction) if _pos_cap is None
                        else _pos_cap)
    is_pos = assigned_gt_inds > 0
    is_neg = assigned_gt_inds == 0
    # squash to (0, 1), monotone in loss
    key = (loss + 1e-6) / (1.0 + loss + 1e-6)

    pos_key = jnp.where(is_pos, 1.0 + key, 0.0)
    _, pos_sel = jax.lax.top_k(pos_key, num_expected_pos)
    chosen_pos = jnp.zeros(n, bool).at[pos_sel].set(True) & is_pos

    if neg_pos_ub > 0:
        max_neg = neg_pos_ub * num_expected_pos
    else:
        max_neg = num
    neg_key = jnp.where(is_neg, key, 0.0)
    _, neg_sel = jax.lax.top_k(neg_key, min(max_neg, num))
    chosen_neg = jnp.zeros(n, bool).at[neg_sel].set(True) & is_neg

    final_key = jnp.where(chosen_pos, 2.0 + key,
                          jnp.where(chosen_neg, key, 0.0))
    key_vals, inds = jax.lax.top_k(final_key, num)
    valid = key_vals > 0.0
    is_pos_out = key_vals > 2.0
    pos_gt_inds = jnp.maximum(assigned_gt_inds[inds] - 1, 0)
    return {
        "inds": inds,
        "is_pos": is_pos_out & valid,
        "valid": valid,
        "pos_gt_inds": pos_gt_inds,
    }


def _banded_topk(assigned_gt_inds, pos_band, neg_band, num):
    """Select the final fixed-size sample from banded keys: positives in
    ``pos_band`` rank above negatives in ``neg_band``.  Keys must be
    0 for never-selectable rows, in (0, 2) for negatives and > 2 for
    positives (value > 3 == quota-selected positive)."""
    final_key = jnp.maximum(pos_band, neg_band)
    key_vals, inds = jax.lax.top_k(final_key, num)
    valid = key_vals > 0.0
    is_pos_out = key_vals > 2.0
    pos_gt_inds = jnp.maximum(assigned_gt_inds[inds] - 1, 0)
    return {"inds": inds, "is_pos": is_pos_out & valid, "valid": valid,
            "pos_gt_inds": pos_gt_inds}


def iou_balanced_neg_sample(rng, assigned_gt_inds, max_overlaps, num,
                            pos_fraction, floor_thr=-1, floor_fraction=0.0,
                            num_bins=3, neg_pos_ub=-1):
    """IoU-balanced negative sampling (Libra R-CNN, arXiv 1904.02701).

    reference: ``mmdet/core/bbox/samplers/iou_balanced_neg_sampler.py`` —
    ``floor_fraction`` of the negatives come from IoU < ``floor_thr``;
    the rest are drawn evenly from ``num_bins`` equal IoU intervals
    spanning [floor_thr, max_iou).  Static-shape formulation: each bin
    gets a per-bin random top-k quota; shortfall refills from the whole
    negative pool via a lower key band (mirroring the reference's
    ``extra_inds`` refill).
    """
    n = assigned_gt_inds.shape[0]
    if num > n:
        inner = iou_balanced_neg_sample(rng, assigned_gt_inds, max_overlaps,
                                        n, pos_fraction, floor_thr,
                                        floor_fraction, num_bins, neg_pos_ub)
        return {k: jnp.pad(v, (0, num - n)) for k, v in inner.items()}
    num_expected_pos = int(num * pos_fraction)
    num_expected_neg = num - num_expected_pos
    is_pos = assigned_gt_inds > 0
    is_neg = assigned_gt_inds == 0

    rng_pos, rng_neg, rng_fill = jax.random.split(rng, 3)
    u_pos = jax.random.uniform(rng_pos, (n,), minval=1e-4, maxval=1.0)
    u_neg = jax.random.uniform(rng_neg, (n,), minval=1e-4, maxval=1.0)
    u_fill = jax.random.uniform(rng_fill, (n,), minval=1e-4, maxval=1.0)

    pos_key = jnp.where(is_pos, 1.0 + u_pos, 0.0)
    _, pos_sel = jax.lax.top_k(pos_key, min(num_expected_pos, n))
    chosen_pos = jnp.zeros(n, bool).at[pos_sel].set(True) & is_pos

    chosen_neg = _iou_balanced_neg_mask(
        u_neg, is_neg, max_overlaps, num_expected_neg,
        floor_thr, floor_fraction, num_bins)

    # bands: quota positives (3, 4) > quota negatives (1, 2) > refill
    # negatives (0, 1); top_k(num) fills shortfall from the refill band
    pos_band = jnp.where(chosen_pos, 3.0 + u_pos, 0.0)
    neg_band = jnp.where(chosen_neg, 1.0 + u_neg,
                         jnp.where(is_neg, u_fill, 0.0))
    return _banded_topk(assigned_gt_inds, pos_band, neg_band, num)


def _iou_balanced_neg_mask(u_neg, is_neg, max_overlaps, num_expected_neg,
                           floor_thr, floor_fraction, num_bins):
    """Negative quota mask of the IoU-balanced sampler (see
    ``iou_balanced_neg_sample``); factored out so ``CombinedSampler``
    can pair it with a different positive sampler."""
    n = is_neg.shape[0]
    neg_iou = jnp.where(is_neg, max_overlaps, -jnp.inf)
    if floor_thr >= 0:
        in_floor = is_neg & (max_overlaps < floor_thr) \
            if floor_thr > 0 else is_neg & (max_overlaps <= 0.0)
        in_iou_set = is_neg & ~in_floor
        num_floor = int(num_expected_neg * floor_fraction)
        base = float(floor_thr)
    else:
        in_floor = jnp.zeros(n, bool)
        in_iou_set = is_neg
        num_floor = 0
        base = float(floor_thr)        # reference keeps -1 as the bin base
    num_iou = num_expected_neg - num_floor
    max_iou = jnp.maximum(jnp.max(jnp.where(in_iou_set, neg_iou, base)),
                          base + 1e-6)
    interval = (max_iou - base) / num_bins
    per_bin = max(num_iou // num_bins, 1)

    chosen_neg = jnp.zeros(n, bool)
    for i in range(num_bins):
        lo = base + i * interval
        hi = base + (i + 1) * interval
        in_bin = in_iou_set & (max_overlaps >= lo) & \
            ((max_overlaps < hi) | (i == num_bins - 1))
        bin_key = jnp.where(in_bin, u_neg, 0.0)
        _, sel = jax.lax.top_k(bin_key, min(per_bin, n))
        chosen_neg = chosen_neg | (jnp.zeros(n, bool).at[sel].set(True)
                                   & in_bin)
    if num_floor > 0:
        floor_key = jnp.where(in_floor, u_neg, 0.0)
        _, sel = jax.lax.top_k(floor_key, min(num_floor, n))
        chosen_neg = chosen_neg | (jnp.zeros(n, bool).at[sel].set(True)
                                   & in_floor)
    return chosen_neg


def _within_group_rank(group_ids, order_key):
    """Rank of each element within its group when sorted by
    ``group_ids`` then ``order_key`` (both (N,)).  Returns (N,) int32
    ranks aligned with the input order."""
    n = group_ids.shape[0]
    sort_key = group_ids.astype(jnp.float32) * 2.0 + order_key
    order = jnp.argsort(sort_key)
    sorted_gids = group_ids[order]
    arange = jnp.arange(n)
    changed = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_gids[1:] != sorted_gids[:-1]])
    starts = jax.lax.associative_scan(
        jnp.maximum, jnp.where(changed, arange, 0))
    rank_sorted = arange - starts
    return jnp.zeros(n, jnp.int32).at[order].set(
        rank_sorted.astype(jnp.int32))


def instance_balanced_pos_sample(rng, assigned_gt_inds, num, pos_fraction,
                                 neg_pos_ub=-1):
    """Equal positives per GT instance (reference
    ``mmdet/core/bbox/samplers/instance_balanced_pos_sampler.py``):
    ``num_per_gt = round(expected / num_gts) + 1`` positives are drawn per
    matched instance; shortfall refills from the remaining positives.

    Static-shape formulation: a within-instance random rank (computed by
    one sort + segmented scan) gates the per-instance quota band; extras
    ride a lower band so ``top_k`` refills exactly like the reference.
    """
    n = assigned_gt_inds.shape[0]
    if num > n:
        inner = instance_balanced_pos_sample(rng, assigned_gt_inds, n,
                                             pos_fraction, neg_pos_ub)
        return {k: jnp.pad(v, (0, num - n)) for k, v in inner.items()}
    num_expected_pos = int(num * pos_fraction)
    is_pos = assigned_gt_inds > 0
    is_neg = assigned_gt_inds == 0

    rng_pos, rng_neg = jax.random.split(rng)
    u_pos = jax.random.uniform(rng_pos, (n,), minval=1e-4, maxval=1.0)
    u_neg = jax.random.uniform(rng_neg, (n,), minval=1e-4, maxval=1.0)

    chosen_pos = _instance_balanced_pos_mask(u_pos, is_pos,
                                             assigned_gt_inds,
                                             num_expected_pos)

    pos_band = jnp.where(chosen_pos, 3.0 + u_pos, 0.0)
    neg_band = jnp.where(is_neg, u_neg, 0.0)
    return _banded_topk(assigned_gt_inds, pos_band, neg_band, num)


def _instance_balanced_pos_mask(u_pos, is_pos, assigned_gt_inds,
                                num_expected_pos):
    """Positive quota mask of the instance-balanced sampler (see
    ``instance_balanced_pos_sample``); factored out for
    ``CombinedSampler``."""
    n = is_pos.shape[0]
    # num_gts = distinct matched instances among positives
    gids = jnp.where(is_pos, assigned_gt_inds, 0)
    rank = _within_group_rank(gids, u_pos)
    num_gts = jnp.maximum(jnp.sum(
        (jnp.zeros(n + 1, bool).at[gids].set(True))[1:]), 1)
    num_per_gt = jnp.round(num_expected_pos / num_gts).astype(jnp.int32) + 1
    in_quota = is_pos & (rank < num_per_gt)

    # quota positives band (5, 6) > extra positives (3, 4); cap the total
    # at num_expected_pos with a top-k over the union
    pos_key = jnp.where(in_quota, 5.0 + u_pos,
                        jnp.where(is_pos, 3.0 + u_pos, 0.0))
    _, pos_sel = jax.lax.top_k(pos_key, min(num_expected_pos, n))
    return jnp.zeros(n, bool).at[pos_sel].set(True) & is_pos


def combined_sample(rng, assigned_gt_inds, max_overlaps, num, pos_fraction,
                    pos_cfg=None, neg_cfg=None, neg_pos_ub=-1):
    """``CombinedSampler`` (reference
    ``mmdet/core/bbox/samplers/combined_sampler.py`` + the libra_rcnn
    configs): an independent positive and negative sub-sampler feed one
    quota-banded top-k.  Supported sub-samplers: pos
    ``InstanceBalancedPosSampler``/``RandomSampler``, neg
    ``IoUBalancedNegSampler``/``RandomSampler``."""
    n = assigned_gt_inds.shape[0]
    if num > n:
        inner = combined_sample(rng, assigned_gt_inds, max_overlaps, n,
                                pos_fraction, pos_cfg, neg_cfg, neg_pos_ub)
        return {k: jnp.pad(v, (0, num - n)) for k, v in inner.items()}
    pos_cfg = dict(pos_cfg or {})
    neg_cfg = dict(neg_cfg or {})
    num_expected_pos = int(num * pos_fraction)
    num_expected_neg = num - num_expected_pos
    is_pos = assigned_gt_inds > 0
    is_neg = assigned_gt_inds == 0

    rng_pos, rng_neg, rng_fill = jax.random.split(rng, 3)
    u_pos = jax.random.uniform(rng_pos, (n,), minval=1e-4, maxval=1.0)
    u_neg = jax.random.uniform(rng_neg, (n,), minval=1e-4, maxval=1.0)
    u_fill = jax.random.uniform(rng_fill, (n,), minval=1e-4, maxval=1.0)

    if pos_cfg.get("type", "RandomSampler") == "InstanceBalancedPosSampler":
        chosen_pos = _instance_balanced_pos_mask(u_pos, is_pos,
                                                 assigned_gt_inds,
                                                 num_expected_pos)
    else:
        pos_key = jnp.where(is_pos, 1.0 + u_pos, 0.0)
        _, sel = jax.lax.top_k(pos_key, min(num_expected_pos, n))
        chosen_pos = jnp.zeros(n, bool).at[sel].set(True) & is_pos

    if neg_cfg.get("type", "RandomSampler") == "IoUBalancedNegSampler":
        chosen_neg = _iou_balanced_neg_mask(
            u_neg, is_neg, max_overlaps, num_expected_neg,
            neg_cfg.get("floor_thr", -1),
            neg_cfg.get("floor_fraction", 0.0),
            neg_cfg.get("num_bins", 3))
    else:
        neg_key = jnp.where(is_neg, 1.0 + u_neg, 0.0)
        _, sel = jax.lax.top_k(neg_key, min(num_expected_neg, n))
        chosen_neg = jnp.zeros(n, bool).at[sel].set(True) & is_neg

    pos_band = jnp.where(chosen_pos, 3.0 + u_pos, 0.0)
    neg_band = jnp.where(chosen_neg, 1.0 + u_neg,
                         jnp.where(is_neg, u_fill, 0.0))
    return _banded_topk(assigned_gt_inds, pos_band, neg_band, num)


def score_hlr_neg_sample(rng, assigned_gt_inds, max_fg_score, num,
                         pos_fraction, score_thr=0.05, bias=0.0, k=0.5,
                         neg_pos_ub=-1):
    """Score hierarchical-local-rank negative sampling + ISR-N weights
    (Prime Sample Attention, arXiv 1904.04821).

    reference: ``mmdet/core/bbox/samplers/score_hlr_sampler.py`` — valid
    negatives (max foreground score > ``score_thr``) are ranked by score
    (hardest first) and selected before random ones; selected negatives
    get loss weights ``(bias + (1-bias) * (1 - rank/n))**k * (n/expected)``.
    TPU formulation: the hierarchical rank (per NMS-match group, then
    across groups) is flattened to the global score rank — the grouping
    changes tie-breaking between overlapping candidates, not which
    candidates are hard; avoiding the O(N²) match keeps the sampler one
    ``top_k``.

    Returns the usual sample dict plus ``neg_label_weights`` ``(num,)``.
    """
    n = assigned_gt_inds.shape[0]
    if num > n:
        inner = score_hlr_neg_sample(rng, assigned_gt_inds, max_fg_score,
                                     n, pos_fraction, score_thr, bias, k,
                                     neg_pos_ub)
        w = inner.pop("neg_label_weights")
        out = {key: jnp.pad(v, (0, num - n)) for key, v in inner.items()}
        out["neg_label_weights"] = jnp.pad(w, (0, num - n),
                                           constant_values=1.0)
        return out
    num_expected_pos = int(num * pos_fraction)
    num_expected_neg = num - num_expected_pos
    is_pos = assigned_gt_inds > 0
    is_neg = assigned_gt_inds == 0

    rng_pos, rng_neg = jax.random.split(rng)
    u_pos = jax.random.uniform(rng_pos, (n,), minval=1e-4, maxval=1.0)
    u_neg = jax.random.uniform(rng_neg, (n,), minval=1e-4, maxval=1.0)

    pos_key = jnp.where(is_pos, 1.0 + u_pos, 0.0)
    _, pos_sel = jax.lax.top_k(pos_key, min(num_expected_pos, n))
    chosen_pos = jnp.zeros(n, bool).at[pos_sel].set(True) & is_pos

    hlr_valid = is_neg & (max_fg_score > score_thr)
    # squash score into (0, 1): hard (high-score) negatives rank first
    s = jnp.clip(max_fg_score, 0.0, 1.0) * (1 - 1e-3)
    hlr_key = jnp.where(hlr_valid, 1.0 + s, 0.0)
    _, hlr_sel = jax.lax.top_k(hlr_key, min(num_expected_neg, n))
    chosen_hlr = jnp.zeros(n, bool).at[hlr_sel].set(True) & hlr_valid

    pos_band = jnp.where(chosen_pos, 3.0 + u_pos, 0.0)
    neg_band = jnp.where(chosen_hlr, 1.0 + s,
                         jnp.where(is_neg, u_neg, 0.0))
    out = _banded_topk(assigned_gt_inds, pos_band, neg_band, num)

    # ISR-N label weights (reference :193-201): rank the selected HLR
    # negatives by descending score within up_bound = max(expected,
    # num_valid); ``imp_weights = (up_bound - rank)/up_bound`` then
    # (bias + (1-bias)*w)^k.  Random-filled negatives get the MIN selected
    # weight (reference :198).  The final loss-sum-preserving norm_ratio
    # (:202-204) needs per-sample losses and is applied by the caller's
    # avg_factor instead.
    valid_score = jnp.where(hlr_valid, s, -1.0)
    rank = (jnp.sum((valid_score[None, :] > valid_score[:, None])
                    & hlr_valid[None, :], axis=1).astype(jnp.float32))
    num_valid = jnp.sum(hlr_valid).astype(jnp.float32)
    up_bound = jnp.maximum(float(num_expected_neg), num_valid)
    w_raw = (up_bound - rank) / up_bound
    w = (bias + (1.0 - bias) * w_raw) ** k
    any_hlr = jnp.any(chosen_hlr)
    min_w = jnp.min(jnp.where(chosen_hlr, w, jnp.inf))
    min_w = jnp.where(any_hlr, min_w, 1.0)
    w = jnp.where(chosen_hlr, w, min_w)
    is_sel_neg = out["valid"] & ~out["is_pos"]
    out["neg_label_weights"] = jnp.where(is_sel_neg, w[out["inds"]], 1.0)
    return out


def concat_gt_to_proposals(proposals, proposal_valid, gt_bboxes, gt_valid):
    """Prepend GT boxes to the proposal set (``add_gt_as_proposals``).

    reference: ``mmdet/core/bbox/samplers/base_sampler.py`` sample() —
    gt boxes join the candidate pool and are self-assigned as positives by
    the caller (assignment recomputed on the concatenated set gives IoU 1).
    """
    boxes = jnp.concatenate([gt_bboxes, proposals], axis=0)
    valid = jnp.concatenate([gt_valid, proposal_valid], axis=0)
    return boxes, valid
