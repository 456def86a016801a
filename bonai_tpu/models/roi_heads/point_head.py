"""PointRend: coarse mask head + uncertainty-driven point refinement
(arXiv 1912.08193).

reference: ``mmdet/models/roi_heads/mask_heads/coarse_mask_head.py``,
``mask_heads/mask_point_head.py``, ``point_rend_roi_head.py``.

TPU redesign notes:
- all point sets have static sizes (num_points / oversampled pool /
  subdivision points), so uncertainty selection is ``lax.top_k`` and the
  per-step refinement is a batched one-hot scatter — no data-dependent
  shapes anywhere;
- the reference's per-image python loops over RoIs become flat (N, P)
  gathers indexed by each RoI's batch index;
- point targets are bilinear samples of the instance-local GT masks
  (see ``core/masks.py`` — the full-res bitmap never exists on device).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def bilinear_point_sample(img, coords):
    """Sample ``img`` at continuous pixel coords with zero padding.

    Args:
      img: ``(H, W)`` or ``(H, W, C)``.
      coords: ``(P, 2)`` (x, y) continuous pixel coordinates (already in
        the ``p * size - 0.5`` frame of ``F.grid_sample``
        ``align_corners=False`` — reference ``mmcv.ops.point_sample``).

    Returns ``(P,)`` or ``(P, C)``.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W = img.shape[:2]
    x, y = coords[:, 0], coords[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    out = 0.0
    for dy, wy in ((0, 1.0 - fy), (1, fy)):
        for dx, wx in ((0, 1.0 - fx), (1, fx)):
            xi = x0.astype(jnp.int32) + dx
            yi = y0.astype(jnp.int32) + dy
            inb = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
            v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
            out = out + v * (wy * wx) * inb[:, None]
    return out[..., 0] if squeeze else out


def rel_roi_to_img_points(rois, rel_pts):
    """(x, y) points normalized within each RoI -> absolute image coords.

    rois ``(N, 5)`` [b, x1, y1, x2, y2]; rel_pts ``(N, P, 2)``."""
    x1, y1 = rois[:, 1, None], rois[:, 2, None]
    w = rois[:, 3, None] - rois[:, 1, None]
    h = rois[:, 4, None] - rois[:, 2, None]
    return jnp.stack([x1 + rel_pts[..., 0] * w,
                      y1 + rel_pts[..., 1] * h], -1)


def fine_grained_point_feats(feat, rois, rel_pts, stride):
    """Bilinear-sample an FPN level at RoI-relative points.

    reference ``point_rend_roi_head.py:73-96`` (per-image loop +
    grid_sample) -> one flat 4-corner gather.

    Args:
      feat: ``(B, H, W, C)`` feature map.
      rois: ``(N, 5)`` with batch index in col 0.
      rel_pts: ``(N, P, 2)`` normalized-in-RoI (x, y).
      stride: feature stride (e.g. 4).

    Returns ``(N, P, C)``.
    """
    B, H, W, C = feat.shape
    img_pts = rel_roi_to_img_points(rois, rel_pts)
    # grid_sample align_corners=False frame on the feature grid
    fx = img_pts[..., 0] / stride - 0.5                     # (N, P)
    fy = img_pts[..., 1] / stride - 0.5
    bidx = rois[:, 0].astype(jnp.int32)[:, None]            # (N, 1)
    flat = feat.reshape(B * H * W, C)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    ax, ay = fx - x0, fy - y0
    out = 0.0
    for dy, wy in ((0, 1.0 - ay), (1, ay)):
        for dx, wx in ((0, 1.0 - ax), (1, ax)):
            xi = x0.astype(jnp.int32) + dx
            yi = y0.astype(jnp.int32) + dy
            inb = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H))
            idx = (bidx * H + jnp.clip(yi, 0, H - 1)) * W + \
                jnp.clip(xi, 0, W - 1)
            v = flat[idx]                                   # (N, P, C)
            out = out + v * ((wy * wx) * inb)[..., None]
    return out


def point_targets_from_instance_masks(rois, rel_pts, matched_boxes,
                                      matched_masks):
    """GT value at each sampled point (reference ``mask_point_head.py:
    147-162`` ``_get_target_single``), via the instance-local masks.

    rois ``(N, 5)``; rel_pts ``(N, P, 2)``; matched_boxes ``(N, 4)``;
    matched_masks ``(N, M, M)``.  Returns ``(N, P)`` float targets.
    """
    M = matched_masks.shape[-1]
    img_pts = rel_roi_to_img_points(rois, rel_pts)
    gx1 = matched_boxes[:, 0, None]
    gy1 = matched_boxes[:, 1, None]
    gw = jnp.maximum(matched_boxes[:, 2, None] - gx1, 1e-6)
    gh = jnp.maximum(matched_boxes[:, 3, None] - gy1, 1e-6)
    u = (img_pts[..., 0] - gx1) / gw * M - 0.5
    v = (img_pts[..., 1] - gy1) / gh * M - 0.5
    return jax.vmap(lambda m, uu, vv: bilinear_point_sample(
        m, jnp.stack([uu, vv], -1)))(matched_masks, u, v)


def uncertainty_points_train(rng, coarse_logits, num_points,
                             oversample_ratio=3,
                             importance_sample_ratio=0.75):
    """Mixed uncertainty/random point sampling (reference
    ``get_roi_rel_points_train``): sample ``num_points * oversample``
    random points, keep the ``importance_ratio`` most uncertain
    (uncertainty = -|logit| at the sampled location), fill the rest with
    fresh random points.

    coarse_logits: ``(N, h, w)`` single-channel fg logits.
    Returns ``(N, num_points, 2)`` rel-RoI (x, y).
    """
    n, h, w = coarse_logits.shape
    n_samp = int(num_points * oversample_ratio)
    n_unc = int(importance_sample_ratio * num_points)
    n_rand = num_points - n_unc
    r1, r2 = jax.random.split(rng)
    pts = jax.random.uniform(r1, (n, n_samp, 2))
    logit = jax.vmap(lambda m, p: bilinear_point_sample(
        m, jnp.stack([p[:, 0] * w - 0.5, p[:, 1] * h - 0.5], -1)))(
        coarse_logits, pts)
    _, idx = jax.lax.top_k(-jnp.abs(logit), n_unc)          # (N, n_unc)
    chosen = jnp.take_along_axis(pts, idx[..., None], axis=1)
    if n_rand > 0:
        chosen = jnp.concatenate(
            [chosen, jax.random.uniform(r2, (n, n_rand, 2))], axis=1)
    return chosen


def uncertainty_points_test(logits, num_points):
    """Most-uncertain grid cells (reference ``get_roi_rel_points_test``).

    logits ``(N, h, w)`` -> (indices ``(N, K)``, rel coords ``(N, K, 2)``)
    with K = min(num_points, h*w); coords at cell centers."""
    n, h, w = logits.shape
    k = min(num_points, h * w)
    flat = -jnp.abs(logits.reshape(n, h * w))
    _, idx = jax.lax.top_k(flat, k)
    xs = (idx % w).astype(jnp.float32)
    ys = (idx // w).astype(jnp.float32)
    coords = jnp.stack([(xs + 0.5) / w, (ys + 0.5) / h], -1)
    return idx, coords


class CoarseMaskHead(nn.Module):
    """FC mask head predicting a low-res (7x7) mask
    (reference ``coarse_mask_head.py:10-91``)."""
    num_convs: int = 0
    num_fcs: int = 2
    in_channels: int = 256
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    num_classes: int = 1
    roi_feat_size: int = 14
    downsample_factor: int = 2
    dtype: Any = jnp.float32

    @property
    def output_size(self):
        return self.roi_feat_size // self.downsample_factor

    @nn.compact
    def __call__(self, x):
        """x (N, S, S, Cin) -> logits (N, out, out, num_classes)."""
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3),
                                padding=[(1, 1), (1, 1)], dtype=self.dtype,
                                kernel_init=kaiming, name=f"conv{i}")(x))
        if self.downsample_factor > 1:
            d = self.downsample_factor
            x = nn.relu(nn.Conv(self.conv_out_channels, (d, d),
                                strides=(d, d), padding="VALID",
                                dtype=self.dtype, kernel_init=kaiming,
                                name="downsample_conv")(x))
        n = x.shape[0]
        x = x.reshape(n, -1)
        xavier = nn.initializers.xavier_uniform()
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 kernel_init=xavier, name=f"fc{i}")(x))
        out = self.output_size
        logits = nn.Dense(self.num_classes * out * out, dtype=self.dtype,
                          kernel_init=nn.initializers.constant(0.001),
                          name="fc_logits")(x)
        return logits.reshape(n, out, out,
                              self.num_classes).astype(jnp.float32)


class MaskPointHead(nn.Module):
    """Shared point MLP over [fine, coarse] features (reference
    ``mask_point_head.py:12-105``); conv1d k=1 == pointwise Dense."""
    num_fcs: int = 3
    in_channels: int = 256
    fc_channels: int = 256
    num_classes: int = 1
    coarse_pred_each_layer: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fine, coarse):
        """fine (N, P, Cf), coarse (N, P, Cc) -> (N, P, num_classes)."""
        x = jnp.concatenate([fine, coarse], -1)
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype,
                                 kernel_init=kaiming, name=f"fc{i}")(x))
            if self.coarse_pred_each_layer:
                x = jnp.concatenate([x, coarse], -1)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.001),
                          name="fc_logits")(x)
        return logits.astype(jnp.float32)
