"""Block-gather RoIAlign — descriptor-efficient TPU formulation.

The straightforward gather formulation (``roi_align.py``) issues one DMA
descriptor per bilinear corner (4 x R x out² x sr² row fetches of C
floats); profiling shows TPU gathers are descriptor-bound (~57M rows/s),
making RoIAlign the dominant cost of the train step.

This version exploits the FPN level-assignment invariant — an RoI spans
only ~14–28 feature cells on its assigned level — to fetch *aligned
32-cell blocks* instead of single cells:

1. reshape the flat level buffer to ``(P/32, 32*C)`` (16KB rows)
2. per RoI and per bilinear sample row, fetch the 3 aligned blocks that
   cover the RoI's x-extent → ``jnp.take`` of large rows (fast path,
   ~14x fewer descriptors)
3. resolve the in-window x positions with one-hot interpolation weights
   contracted on the MXU (small batched matmuls)

Numerics are identical to the reference bilinear sampling; x-extents
beyond the 96-cell window (aspect ratio > ~5 at the assigned level) fall
back to zero contribution and are irrelevant for building footprints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .roi_align import map_roi_levels, _sample_coords

TARGET_WINDOW = 96   # cells: covers RoI x-extents up to aspect ~5 at the
                     # assigned level (level rule keeps sqrt(wh) in [56,112)px)


def multilevel_roi_align_blocked(features, rois, output_size,
                                 featmap_strides, sampling_ratio=2,
                                 aligned=True, finest_scale=56,
                                 roi_valid=None, flat_pack=None):
    """Drop-in replacement for ``multilevel_roi_align`` (same contract)."""
    import math
    from .roi_align import prepare_flat_levels, multilevel_roi_align
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    sr = max(int(sampling_ratio), 1)
    if flat_pack is None:
        flat_pack = prepare_flat_levels(features[:len(featmap_strides)])
    flat, consts = flat_pack
    num_levels = len(featmap_strides)
    C = consts["C"]
    dtype = flat.dtype
    heights = consts["heights"][:num_levels]
    widths = consts["widths"][:num_levels]
    level_offsets = consts["level_offsets"][:num_levels]
    P = int(flat.shape[0])
    # block size must divide every level width so aligned blocks never
    # cross a feature row; fall back to the plain gather path otherwise
    BLOCK = math.gcd(32, *(int(w) for w in widths))
    if BLOCK < 8 or P % BLOCK:
        return multilevel_roi_align(
            features, rois, output_size, featmap_strides,
            sampling_ratio=sampling_ratio, aligned=aligned,
            finest_scale=finest_scale, roi_valid=roi_valid,
            flat_pack=flat_pack)
    XBLOCKS = max(TARGET_WINDOW // BLOCK, 2)
    WINDOW = BLOCK * XBLOCKS
    flat_blocks = flat.reshape(P // BLOCK, BLOCK * C)

    boxes = rois[:, 1:5]
    batch_idx = rois[:, 0].astype(jnp.int32)
    lvl = map_roi_levels(boxes, num_levels, finest_scale)
    strides = jnp.asarray(featmap_strides, jnp.float32)
    inv_scale = 1.0 / strides[lvl]
    Hl = jnp.asarray(heights)[lvl]
    Wl = jnp.asarray(widths)[lvl]
    base_off = jnp.asarray(level_offsets)[lvl] + batch_idx * Hl * Wl

    scaled = boxes * inv_scale[:, None]
    ys, xs = _sample_coords(scaled, output_size, sr, aligned)
    # ys, xs: (R, oh*sr, ow*sr); per-RoI x columns identical across rows
    R = boxes.shape[0]
    oh, ow = output_size
    ny = oh * sr
    nx = ow * sr
    y_samples = ys[:, :, 0]                     # (R, ny)
    x_samples = xs[:, 0, :]                     # (R, nx)

    Hf = Hl.astype(jnp.float32)
    Wf = Wl.astype(jnp.float32)
    out_y = (y_samples < -1.0) | (y_samples > Hf[:, None])
    out_x = (x_samples < -1.0) | (x_samples > Wf[:, None])
    yc = jnp.clip(y_samples, 0.0, Hf[:, None] - 1.0)
    xc = jnp.clip(x_samples, 0.0, Wf[:, None] - 1.0)
    y0 = jnp.clip(jnp.floor(yc), 0,
                  jnp.maximum(Hl[:, None] - 2, 0)).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xc), 0,
                  jnp.maximum(Wl[:, None] - 2, 0)).astype(jnp.int32)
    ly = (yc - y0).astype(jnp.float32)
    lx = (xc - x0).astype(jnp.float32)
    ly = jnp.where(out_y, 0.0, ly)

    # x window: aligned block start covering all sample x0 of the RoI
    x_first = jnp.min(x0, axis=1)                          # (R,)
    blk0 = (x_first // BLOCK)
    max_blk_in_row = jnp.maximum(Wl // BLOCK - 1, 0)
    blk0 = jnp.minimum(blk0, jnp.maximum(Wl // BLOCK - XBLOCKS, 0))
    win_start = blk0 * BLOCK                               # (R,) cells

    # fetch: for each sample row (y0 and y0+1), XBLOCKS aligned blocks
    row_cell0 = base_off[:, None] + y0 * Wl[:, None]       # (R, ny)
    row_cell1 = base_off[:, None] + jnp.minimum(
        y0 + 1, Hl[:, None] - 1) * Wl[:, None]
    # global block index = (row_cell + win_start)/BLOCK + j
    gblk0 = (row_cell0 + win_start[:, None]) // BLOCK      # (R, ny)
    gblk1 = (row_cell1 + win_start[:, None]) // BLOCK
    offs = jnp.arange(XBLOCKS, dtype=jnp.int32)
    idx = jnp.stack([gblk0[..., None] + offs,
                     gblk1[..., None] + offs], axis=2)     # (R, ny, 2, XB)
    idx = jnp.clip(idx, 0, P // BLOCK - 1)
    F = jnp.take(flat_blocks, idx.reshape(-1), axis=0)
    F = F.reshape(R, ny, 2, WINDOW, C)                     # window cells

    # x one-hot interpolation weights on the window
    e0 = x0 - win_start[:, None]                           # (R, nx)
    wx_hi = jnp.where(out_x, 0.0, 1.0 - lx)
    wx_lo = jnp.where(out_x, 0.0, lx)
    iota = jnp.arange(WINDOW, dtype=jnp.int32)
    onehot0 = (iota[None, None, :] == e0[..., None]).astype(jnp.float32)
    onehot1 = (iota[None, None, :] == (e0 + 1)[..., None]).astype(jnp.float32)
    wx = onehot0 * wx_hi[..., None] + onehot1 * wx_lo[..., None]  # (R,nx,W)

    # contract window -> x samples on the MXU: (R,nx,W) x (R,ny,2,W,C).
    # precision=HIGHEST: jax's default matmul precision runs f32 inputs
    # through bf16 passes, which quantises the interpolation weights.
    G = jnp.einsum("rxw,rytwc->rxytc", wx.astype(dtype), F,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)    # (R,nx,ny,2,C)
    wy = jnp.stack([1.0 - ly, ly], axis=-1)                # (R, ny, 2)
    vals = jnp.einsum("rxytc,ryt->rxyc", G, wy,
                      precision=jax.lax.Precision.HIGHEST)  # (R,nx,ny,C)
    vals = jnp.transpose(vals, (0, 2, 1, 3))               # (R,ny,nx,C)
    if roi_valid is not None:
        vals = vals * roi_valid[:, None, None, None].astype(vals.dtype)
    vals = vals.reshape(R, oh, sr, ow, sr, C)
    return jnp.mean(vals, axis=(2, 4)).astype(dtype)
