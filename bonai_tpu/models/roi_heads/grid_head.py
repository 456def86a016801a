"""Grid R-CNN head: grid-point heatmap localisation with spatial
information fusion (arXiv 1811.12030 / 1906.05688 "plus" variant).

reference: ``mmdet/models/roi_heads/mask_heads/grid_head.py`` +
``grid_roi_head.py``.

TPU redesign notes:
- the reference's per-RoI python loops that paint circular target discs
  become one broadcast comparison over a (P, 9, half, half) lattice;
- the per-point grouped convs / grouped deconvs are expressed as 9
  channel slices with their own small convs (static python loop, all
  fused by XLA); the quarter-sized sub-region crop of Grid R-CNN Plus
  is folded directly into target/decode coordinates so the full-size
  heatmap is never materialised.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sub_regions_np(grid_points, whole_map_size):
    """Per-point half-sized sub-window origin (reference
    ``calc_sub_regions``; x_idx = i // gs, y_idx = i % gs)."""
    gs = int(np.sqrt(grid_points))
    half = whole_map_size // 4 * 2
    out = []
    for i in range(grid_points):
        x_idx, y_idx = i // gs, i % gs
        def _o(idx):
            if idx == 0:
                return 0
            if idx == gs - 1:
                return half
            return max(int((idx / (gs - 1) - 0.25) * whole_map_size), 0)
        out.append((_o(x_idx), _o(y_idx)))
    return np.asarray(out, np.int32)                       # (G, 2) x,y


def grid_factors_np(grid_points):
    """Interpolation factors of each grid point between gt corners
    (reference ``get_targets`` factors)."""
    gs = int(np.sqrt(grid_points))
    f = []
    for j in range(grid_points):
        x_idx, y_idx = j // gs, j % gs
        f.append((1 - x_idx / (gs - 1), 1 - y_idx / (gs - 1)))
    return np.asarray(f, np.float32)                       # (G, 2) fx,fy


class GridHead(nn.Module):
    """reference ``grid_head.py:10-190``."""
    grid_points: int = 9
    num_convs: int = 8
    roi_feat_size: int = 14
    in_channels: int = 256
    point_feat_channels: int = 64
    dtype: Any = jnp.float32

    @property
    def whole_map_size(self):
        return self.roi_feat_size * 4

    @nn.compact
    def __call__(self, x, train=False):
        g, c = self.grid_points, self.point_feat_channels
        gs = int(np.sqrt(g))
        cout = g * c
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out",
                                                   "normal")
        h = x
        for i in range(self.num_convs):
            h = nn.Conv(cout, (3, 3), strides=(2, 2) if i == 0 else (1, 1),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        kernel_init=kaiming, name=f"conv{i}")(h)
            h = nn.GroupNorm(num_groups=36, dtype=self.dtype,
                             name=f"gn{i}")(h)
            h = nn.relu(h)

        # neighbour graph (4-connectivity on the gs x gs lattice,
        # x-major point index — reference ``grid_head.py:96-105``)
        neighbors = []
        for i in range(gs):
            for j in range(gs):
                n = []
                if i > 0:
                    n.append((i - 1) * gs + j)
                if j > 0:
                    n.append(i * gs + j - 1)
                if j < gs - 1:
                    n.append(i * gs + j + 1)
                if i < gs - 1:
                    n.append((i + 1) * gs + j)
                neighbors.append(n)

        def trans(name):
            # 5x5 depthwise + 1x1 (reference transition modules)
            def f(v):
                v = nn.Conv(c, (5, 5), padding=[(2, 2), (2, 2)],
                            feature_group_count=c, dtype=self.dtype,
                            kernel_init=kaiming, name=name + "_dw")(v)
                return nn.Conv(c, (1, 1), dtype=self.dtype,
                               kernel_init=kaiming, name=name + "_pw")(v)
            return f

        parts = [h[..., i * c:(i + 1) * c] for i in range(g)]
        x_fo = []
        for i, ns in enumerate(neighbors):
            acc = parts[i]
            for j, pi in enumerate(ns):
                acc = acc + trans(f"fo_{i}_{j}")(parts[pi])
            x_fo.append(acc)
        x_so = []
        for i, ns in enumerate(neighbors):
            acc = parts[i]
            for j, pi in enumerate(ns):
                acc = acc + trans(f"so_{i}_{j}")(x_fo[pi])
            x_so.append(acc)

        bias2 = nn.initializers.constant(-float(np.log(0.99 / 0.01)))
        # grouped 4x4 stride-2 deconvs as per-point slices; the modules
        # are created ONCE so the fused and unfused paths share weights
        # (reference applies the same deconv1/deconv2 to both)
        deconv1 = [nn.ConvTranspose(
            c, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
            name=f"deconv1_{i}") for i in range(g)]
        deconv_gn = nn.GroupNorm(num_groups=g, dtype=self.dtype,
                                 name="deconv_gn")
        deconv2 = [nn.ConvTranspose(
            1, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001), bias_init=bias2,
            name=f"deconv2_{i}") for i in range(g)]

        def deconv_path(v):
            outs1 = [deconv1[i](v[..., i * c:(i + 1) * c])
                     for i in range(g)]
            u = nn.relu(deconv_gn(jnp.concatenate(outs1, -1)))
            outs2 = [deconv2[i](u[..., i * c:(i + 1) * c])
                     for i in range(g)]
            return jnp.concatenate(outs2, -1)          # (N, half, half, G)

        fused = deconv_path(jnp.concatenate(x_so, -1))
        unfused = deconv_path(h) if train else fused
        return {"fused": fused.astype(jnp.float32),
                "unfused": unfused.astype(jnp.float32)}


def jitter_boxes(rng, boxes, img_shape, amplitude=0.15):
    """Random jitter of positive proposals (reference
    ``grid_roi_head.py:38-62``)."""
    off = jax.random.uniform(rng, boxes.shape, minval=-amplitude,
                             maxval=amplitude)
    cxcy = (boxes[..., 2:4] + boxes[..., :2]) * 0.5
    wh = jnp.abs(boxes[..., 2:4] - boxes[..., :2])
    new_c = cxcy + wh * off[..., :2]
    new_wh = wh * (1 + off[..., 2:])
    out = jnp.concatenate([new_c - new_wh * 0.5, new_c + new_wh * 0.5], -1)
    h, w = img_shape[0], img_shape[1]
    return jnp.stack([jnp.clip(out[..., 0], 0, w - 1),
                      jnp.clip(out[..., 1], 0, h - 1),
                      jnp.clip(out[..., 2], 0, w - 1),
                      jnp.clip(out[..., 3], 0, h - 1)], -1)


def grid_targets(pos_boxes, gt_boxes, grid_points, whole_map_size,
                 pos_radius=1):
    """Vectorised sub-region heatmap targets (reference
    ``get_targets``): disc of ``pos_radius`` around each grid point of
    the gt box, in the 2x-expanded proposal frame, cropped to the
    per-point half-sized sub-window.

    ``pos_boxes``/``gt_boxes``: (P, 4).  Returns (P, G, half, half).
    """
    half = whole_map_size // 4 * 2
    sub = jnp.asarray(sub_regions_np(grid_points, whole_map_size))
    fac = jnp.asarray(grid_factors_np(grid_points))
    # 2x expansion
    w = pos_boxes[:, 2] - pos_boxes[:, 0]
    h = pos_boxes[:, 3] - pos_boxes[:, 1]
    ex1 = pos_boxes[:, 0] - w * 0.5
    ey1 = pos_boxes[:, 1] - h * 0.5
    ew, eh = 2 * w, 2 * h
    gx = fac[None, :, 0] * gt_boxes[:, 0, None] \
        + (1 - fac[None, :, 0]) * gt_boxes[:, 2, None]      # (P, G)
    gy = fac[None, :, 1] * gt_boxes[:, 1, None] \
        + (1 - fac[None, :, 1]) * gt_boxes[:, 3, None]
    cx = jnp.floor((gx - ex1[:, None]) / jnp.maximum(ew[:, None], 1e-6)
                   * whole_map_size)
    cy = jnp.floor((gy - ey1[:, None]) / jnp.maximum(eh[:, None], 1e-6)
                   * whole_map_size)
    xs = jnp.arange(half, dtype=jnp.float32)[None, None, :] \
        + sub[None, :, 0, None]                             # (1, G, half)
    ys = jnp.arange(half, dtype=jnp.float32)[None, None, :] \
        + sub[None, :, 1, None]
    dx2 = (xs - cx[..., None]) ** 2                         # (P, G, half)
    dy2 = (ys - cy[..., None]) ** 2
    disc = (dy2[..., :, None] + dx2[..., None, :]) <= pos_radius ** 2
    # reference skips boxes with expanded w/h <= grid_size (targets
    # remain all-zero but still train the logits toward background)
    gs = int(np.sqrt(grid_points))
    ok = (ew > gs) & (eh > gs)
    return disc.astype(jnp.float32) * ok[:, None, None, None]


def grid_decode_boxes(det_boxes, heatmap, grid_points, whole_map_size,
                      img_shape):
    """Grid-point voting decode (reference ``get_bboxes``).

    ``det_boxes`` (M, 4), ``heatmap`` (M, half, half, G) logits.
    Returns refined (M, 4).
    """
    gs = int(np.sqrt(grid_points))
    half = whole_map_size // 4 * 2
    sub = jnp.asarray(sub_regions_np(grid_points, whole_map_size))
    prob = jax.nn.sigmoid(heatmap)
    flat = prob.reshape(prob.shape[0], half * half, grid_points)
    best = jnp.argmax(flat, axis=1)                        # (M, G)
    score = jnp.max(flat, axis=1)
    xs = (best % half).astype(jnp.float32) + sub[None, :, 0]
    ys = (best // half).astype(jnp.float32) + sub[None, :, 1]
    w = (det_boxes[:, 2] - det_boxes[:, 0])[:, None]
    h = (det_boxes[:, 3] - det_boxes[:, 1])[:, None]
    x1e = det_boxes[:, 0, None] - w * 0.5
    y1e = det_boxes[:, 1, None] - h * 0.5
    # (pos + 0.5)/half * w maps the half-sized window onto the
    # 2x-expanded box span (half*2 == whole, w_exp == 2w cancel out)
    abs_x = (xs + 0.5) / half * w + x1e
    abs_y = (ys + 0.5) / half * h + y1e

    x1_i = jnp.asarray([i for i in range(gs)])
    y1_i = jnp.asarray([i * gs for i in range(gs)])
    x2_i = jnp.asarray([grid_points - gs + i for i in range(gs)])
    y2_i = jnp.asarray([(i + 1) * gs - 1 for i in range(gs)])

    def vote(vals, sc, idx):
        s = sc[:, idx]
        return jnp.sum(vals[:, idx] * s, axis=1) / \
            jnp.maximum(jnp.sum(s, axis=1), 1e-6)

    bx1 = vote(abs_x, score, x1_i)
    by1 = vote(abs_y, score, y1_i)
    bx2 = vote(abs_x, score, x2_i)
    by2 = vote(abs_y, score, y2_i)
    hh, ww = img_shape[0], img_shape[1]
    return jnp.stack([jnp.clip(bx1, 0, ww), jnp.clip(by1, 0, hh),
                      jnp.clip(bx2, 0, ww), jnp.clip(by2, 0, hh)], -1)
