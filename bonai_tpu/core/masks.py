"""Mask target extraction and mask pasting.

reference: ``mmdet/core/mask/mask_target.py:6-62`` (targets via
``BitmapMasks.crop_and_resize``, i.e. RoIAlign on the full-resolution GT
bitmap), ``mmdet/models/roi_heads/mask_heads/fcn_mask_head.py:151-308``
(chunked grid-sample paste at test time), and
``mmdet/core/mask/structures.py:305-330`` (``translation`` used to derive
footprint masks from roof masks).

TPU-first redesign: full-resolution per-instance bitmaps (MAX_GT x 1024 x
1024 per image) are far too large to ship to the device, so the host
pipeline stores each GT mask *cropped to its GT box* at a fixed
``inst_size`` resolution (the TF TPU Mask R-CNN trick).  Mask targets for a
sampled proposal are then bilinear samples of the instance-local mask at
the proposal's 28x28 grid points — numerically equivalent to reference
crop_and_resize up to resampling resolution.  Pasting back to image
resolution happens on host (numpy/cv2) after device inference, mirroring
the reference's CPU RLE encode step (``mmdet/apis/test.py:59-67``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mask_targets_from_instance_masks(pos_proposals, matched_gt_bboxes,
                                     matched_inst_masks, mask_size=28):
    """Compute ``(P, S, S)`` float mask targets for positive proposals.

    Args:
      pos_proposals: ``(P, 4)`` proposal boxes (image coords).
      matched_gt_bboxes: ``(P, 4)`` matched GT boxes (image coords).
      matched_inst_masks: ``(P, M, M)`` instance-local GT masks, each
        covering its GT box exactly.
      mask_size: target side S (reference rcnn cfg ``mask_size=28``).

    Returns float targets in [0, 1] binarised at 0.5 (reference behaviour).
    """
    P = pos_proposals.shape[0]
    M = matched_inst_masks.shape[-1]
    S = mask_size
    # absolute coords of target-cell centers within the proposal
    x1, y1, x2, y2 = (pos_proposals[:, i] for i in range(4))
    cell = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
    xs = x1[:, None] + (x2 - x1)[:, None] * cell[None, :]      # (P, S)
    ys = y1[:, None] + (y2 - y1)[:, None] * cell[None, :]
    # map into instance-local mask coordinates (pixel centers at (u+0.5)/M)
    gx1, gy1, gx2, gy2 = (matched_gt_bboxes[:, i] for i in range(4))
    gw = jnp.maximum(gx2 - gx1, 1e-6)
    gh = jnp.maximum(gy2 - gy1, 1e-6)
    u = (xs - gx1[:, None]) / gw[:, None] * M - 0.5            # (P, S)
    v = (ys - gy1[:, None]) / gh[:, None] * M - 0.5
    # Bilinear sampling as two separable interpolation matmuls
    # (out = Wv @ mask @ Wu^T) instead of 4 advanced-indexing gathers:
    # P*S*S scalar gathers lower to descriptor-bound fusions (~19 ms/step
    # profiled); the one-hot contraction is ~0.5 GFLOP on the MXU.
    def interp_matrix(coords):
        # (P, S) fractional mask coords -> (P, S, M) bilinear weights,
        # zero outside [-1, M] (instance is 0 outside its box)
        inside = (coords > -1.0) & (coords < M)
        c = jnp.clip(coords, 0.0, M - 1.0)
        c0 = jnp.clip(jnp.floor(c), 0, M - 2)
        frac = (c - c0)[:, :, None]
        iota = jax.lax.broadcasted_iota(jnp.float32, (P, S, M), 2)
        w = jnp.where(iota == c0[:, :, None], 1.0 - frac, 0.0) \
            + jnp.where(iota == c0[:, :, None] + 1.0, frac, 0.0)
        return w * inside[:, :, None]
    wv = interp_matrix(v)                                 # (P, S, M)
    wu = interp_matrix(u)                                 # (P, S, M)
    mask_f = matched_inst_masks.astype(jnp.float32)
    rows = jax.lax.dot_general(
        wv, mask_f, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)              # (P, S, M)
    vals = jax.lax.dot_general(
        rows, wu, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST)              # (P, S, S)
    return (vals >= 0.5).astype(jnp.float32)


def paste_masks_np(mask_probs, boxes, img_h, img_w, thr=0.5):
    """Paste ``(N, S, S)`` mask probabilities into image-size binary masks.

    Host-side numpy equivalent of ``FCNMaskHead.get_seg_masks``'s
    ``_do_paste_mask`` (reference ``fcn_mask_head.py:241-308``).
    """
    import cv2
    n = mask_probs.shape[0]
    out = np.zeros((n, img_h, img_w), np.uint8)
    for i in range(n):
        x1, y1, x2, y2 = boxes[i]
        x1i = int(np.floor(x1))
        y1i = int(np.floor(y1))
        x2i = int(np.ceil(x2))
        y2i = int(np.ceil(y2))
        w = max(x2i - x1i, 1)
        h = max(y2i - y1i, 1)
        resized = cv2.resize(mask_probs[i].astype(np.float32), (w, h),
                             interpolation=cv2.INTER_LINEAR)
        xs = max(x1i, 0)
        ys = max(y1i, 0)
        xe = min(x2i, img_w)
        ye = min(y2i, img_h)
        if xe <= xs or ye <= ys:
            continue
        out[i, ys:ye, xs:xe] = (
            resized[ys - y1i:ye - y1i, xs - x1i:xe - x1i] > thr)
    return out


def translate_mask_np(masks, offset_xy, border_value=0):
    """Translate binary masks by ``(dx, dy)`` — the semi-supervised
    roof→footprint synthesis (reference ``structures.py:305-330``)."""
    import cv2
    dx, dy = offset_xy
    mat = np.float32([[1, 0, dx], [0, 1, dy]])
    out = np.stack([
        cv2.warpAffine(m.astype(np.uint8), mat, (m.shape[1], m.shape[0]),
                       borderValue=border_value) for m in masks])
    return out
