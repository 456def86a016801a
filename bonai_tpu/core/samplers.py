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


def concat_gt_to_proposals(proposals, proposal_valid, gt_bboxes, gt_valid):
    """Prepend GT boxes to the proposal set (``add_gt_as_proposals``).

    reference: ``mmdet/core/bbox/samplers/base_sampler.py`` sample() —
    gt boxes join the candidate pool and are self-assigned as positives by
    the caller (assignment recomputed on the concatenated set gives IoU 1).
    """
    boxes = jnp.concatenate([gt_bboxes, proposals], axis=0)
    valid = jnp.concatenate([gt_valid, proposal_valid], axis=0)
    return boxes, valid
