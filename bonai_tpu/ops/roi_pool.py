"""RoIPool and Deformable RoI Pooling.

reference: mmcv ``ops/roi_pool.py`` (CUDA max-pool over quantised bins)
and ``mmdet/ops`` DeformRoIPooling (arXiv 1703.06211 §3.2) — listed in
SURVEY §2.9; neither is on the BONAI trunk (RoIAlign replaced RoIPool
in all shipped configs), provided for API completeness.

TPU redesign: exact dynamic-extent bin max-pooling is shape-hostile; a
bin's max is taken over a static ``samples x samples`` nearest-neighbour
grid instead (converges to the exact max as samples grow; the quantised
bin edges follow the reference rounding).  Deformable pooling shifts
each bin's sample grid by a per-bin offset (normalised by the RoI size
times ``gamma``) and bilinearly samples — the same formulation the
CUDA kernel uses, minus the dynamic part count.
"""

from __future__ import annotations

from typing import Any

import jax
import flax.linen as _nn
import jax.numpy as jnp


def _bin_grid(rois, out_size, samples, quantise):
    """Per-bin sample coordinates -> (R, S, S, samples, samples, 2)."""
    x1, y1, x2, y2 = (rois[:, i] for i in range(1, 5))
    if quantise:
        x1, y1 = jnp.round(x1), jnp.round(y1)
        x2, y2 = jnp.round(x2), jnp.round(y2)
        w = jnp.maximum(x2 - x1 + 1, 1.0)
        h = jnp.maximum(y2 - y1 + 1, 1.0)
    else:
        w = jnp.maximum(x2 - x1, 1e-6)
        h = jnp.maximum(y2 - y1, 1e-6)
    S = out_size
    cell = (jnp.arange(S) + 0.5) / S                         # (S,)
    sub = (jnp.arange(samples) + 0.5) / samples / S          # (k,)
    gx = x1[:, None, None] + w[:, None, None] * (
        cell[None, :, None] - 0.5 / S + sub[None, None, :])   # (R, S, k)
    gy = y1[:, None, None] + h[:, None, None] * (
        cell[None, :, None] - 0.5 / S + sub[None, None, :])
    return gx, gy


def roi_pool(feat, rois, out_size=7, spatial_scale=1.0, samples=4):
    """Quantised max RoI pooling (reference mmcv RoIPool).

    feat ``(B, H, W, C)``; rois ``(R, 5)`` image coords.  Returns
    ``(R, S, S, C)`` — max over a ``samples^2`` nearest grid per bin.
    """
    B, H, W, C = feat.shape
    scaled = jnp.concatenate(
        [rois[:, :1], rois[:, 1:] * spatial_scale], axis=1)
    gx, gy = _bin_grid(scaled, out_size, samples, quantise=True)
    xi = jnp.clip(jnp.floor(gx), 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.floor(gy), 0, H - 1).astype(jnp.int32)
    bidx = rois[:, 0].astype(jnp.int32)
    flat = feat.reshape(B * H * W, C)
    # (R, Sy, ky, Sx, kx) index lattice
    idx = (bidx[:, None, None, None, None] * H
           + yi[:, :, :, None, None]) * W + xi[:, None, None, :, :]
    vals = flat[idx]                                # (R,S,k,S,k,C)
    return jnp.max(vals, axis=(2, 4))


def deform_roi_pool(feat, rois, offsets, out_size=7, spatial_scale=1.0,
                    gamma=0.1, sampling_ratio=2):
    """Deformable RoI pooling (mmcv ``DeformRoIPoolPack`` semantics):
    each output bin's sample grid is translated by
    ``offset * gamma * (roi_w, roi_h)`` before bilinear sampling + mean.

    offsets: ``(R, S, S, 2)`` (dx, dy) normalised offsets.
    """
    B, H, W, C = feat.shape
    scaled = jnp.concatenate(
        [rois[:, :1], rois[:, 1:] * spatial_scale], axis=1)
    x1, y1, x2, y2 = (scaled[:, i] for i in range(1, 5))
    rw = jnp.maximum(x2 - x1, 1e-6)
    rh = jnp.maximum(y2 - y1, 1e-6)
    gx, gy = _bin_grid(scaled, out_size, sampling_ratio, quantise=False)
    ox = offsets[..., 0] * gamma * rw[:, None, None]          # (R,Sy,Sx)
    oy = offsets[..., 1] * gamma * rh[:, None, None]
    # gx/gy are (R, S, k); expand to the (R, Sy, ky, Sx, kx) lattice and
    # translate each (Sy, Sx) bin by its offset
    R = rois.shape[0]
    shape = (R, out_size, sampling_ratio, out_size, sampling_ratio)
    fx = jnp.broadcast_to(gx[:, None, None, :, :], shape) \
        + ox[:, :, None, :, None]
    fy = jnp.broadcast_to(gy[:, :, :, None, None], shape) \
        + oy[:, :, None, :, None]
    fx = fx - 0.5
    fy = fy - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    ax, ay = fx - x0, fy - y0
    bidx = rois[:, 0].astype(jnp.int32)
    flat = feat.reshape(B * H * W, C)
    out = 0.0
    for dy, wy in ((0, 1.0 - ay), (1, ay)):
        for dx, wx in ((0, 1.0 - ax), (1, ax)):
            xi = x0.astype(jnp.int32) + dx
            yi = y0.astype(jnp.int32) + dy
            inb = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
            idx = (bidx[:, None, None, None, None] * H
                   + jnp.clip(yi, 0, H - 1)) * W + jnp.clip(xi, 0, W - 1)
            out = out + flat[idx] * ((wy * wx) * inb)[..., None]
    return jnp.mean(out, axis=(2, 4))


def multilevel_deform_roi_pool(feats, rois, pool_one, strides,
                               roi_valid=None, finest_scale=56):
    """FPN-level-mapped deformable/quantised RoI pooling.

    ``pool_one(feat, rois_scaled, spatial_scale)`` is applied per level
    (reference ``SingleRoIExtractor.map_roi_levels`` rule: level =
    floor(log2(sqrt(area) / finest_scale + 1e-6)) clamped); the per-RoI
    result is selected from its mapped level.  Runs every level over all
    RoIs and selects — O(L) overhead, acceptable for the dpool/mdpool
    config family which is never on the hot path.
    """
    w = rois[:, 3] - rois[:, 1]
    h = rois[:, 4] - rois[:, 2]
    scale = jnp.sqrt(jnp.clip(w * h, 1e-6))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, len(feats) - 1).astype(jnp.int32)
    out = None
    for i, (feat, st) in enumerate(zip(feats, strides)):
        pooled = pool_one(feat, rois, 1.0 / st)
        sel = (lvl == i)[:, None, None, None]
        out = pooled * sel if out is None else out + pooled * sel
    if roi_valid is not None:
        out = out * roi_valid[:, None, None, None]
    return out


class DeformRoIPoolPack(_nn.Module):
    """mmcv ``DeformRoIPoolPack`` / ``ModulatedDeformRoIPoolPack``
    (reference configs/dcn/faster_rcnn_r50_fpn_{dpool,mdpool}_1x_coco.py):
    a first zero-offset pooling pass feeds FC layers that predict per-bin
    offsets (and, when ``modulated``, a sigmoid mask) for the second,
    deformable pass.  The FC stacks follow the mmcv Pack layout
    (deform_fc_channels x2 -> 2*S*S, zero-initialised final layer so the
    op starts as plain average RoI pooling)."""
    output_size: int = 7
    output_channels: int = 256
    deform_fc_channels: int = 1024
    gamma: float = 0.1
    modulated: bool = False
    dtype: Any = jnp.float32

    @_nn.compact
    def __call__(self, feat, rois, spatial_scale):
        S = self.output_size
        R = rois.shape[0]
        zero_off = jnp.zeros((R, S, S, 2), jnp.float32)
        first = deform_roi_pool(feat, rois, zero_off, S, spatial_scale,
                                self.gamma)
        flat = first.reshape(R, -1).astype(self.dtype)
        x = _nn.relu(_nn.Dense(self.deform_fc_channels, dtype=self.dtype,
                               name="offset_fc0")(flat))
        x = _nn.relu(_nn.Dense(self.deform_fc_channels, dtype=self.dtype,
                               name="offset_fc1")(x))
        off = _nn.Dense(2 * S * S, dtype=self.dtype,
                        kernel_init=_nn.initializers.zeros,
                        name="offset_fc2")(x)
        off = off.astype(jnp.float32).reshape(R, S, S, 2)
        out = deform_roi_pool(feat, rois, off, S, spatial_scale,
                              self.gamma)
        if self.modulated:
            m = _nn.relu(_nn.Dense(self.deform_fc_channels,
                                   dtype=self.dtype,
                                   name="mask_fc0")(flat))
            m = _nn.Dense(S * S, dtype=self.dtype,
                          kernel_init=_nn.initializers.zeros,
                          name="mask_fc1")(m)
            mask = jax.nn.sigmoid(m.astype(jnp.float32)).reshape(R, S, S, 1)
            out = out * mask
        return out
