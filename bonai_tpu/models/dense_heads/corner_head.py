"""CornerNet head: paired-keypoint detection (arXiv 1808.01244).

reference: ``mmdet/models/dense_heads/corner_head.py`` (BiCornerPool,
CornerHead, decode_heatmap) + ``mmdet/models/utils/gaussian_target.py``.

TPU redesign notes:
- corner pooling is ``lax.associative_scan`` cummax (``ops/layers.py``),
  not a CUDA scan kernel;
- gaussian corner targets: the reference paints one (2r+1)^2 window per
  GT in a python loop; here each heatmap pixel evaluates a broadcast
  max over all (padded) GTs of the windowed gaussian — one fused
  reduction, no data-dependent slicing;
- decode keeps everything top-k/static: 3x3 local-max NMS, K corners
  per side, K x K pairing scored and filtered by masks instead of
  boolean indexing.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.layers import corner_pool


def gaussian_radius(h, w, min_overlap=0.3):
    """Per-GT gaussian radius (reference ``gaussian_target.py:90-185``):
    min of the three Vieta roots; vectorised over (G,) box sizes."""
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 - jnp.sqrt(jnp.maximum(b1 * b1 - 4 * c1, 0.0))) / 2

    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    r2 = (b2 - jnp.sqrt(jnp.maximum(b2 * b2 - 16 * c2, 0.0))) / 8

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    r3 = (-b3 + jnp.sqrt(jnp.maximum(b3 * b3 - 4 * a3 * c3, 0.0))) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def _paint_gaussians(cx, cy, radius, valid, height, width):
    """Max-combined windowed gaussians: ``(G,)`` int centers + radii ->
    ``(H, W)`` heatmap (reference ``gen_gaussian_target``)."""
    ys = jnp.arange(height, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, None, :]
    dx = xs - cx[:, None, None]
    dy = ys - cy[:, None, None]
    diameter = 2 * radius + 1
    sigma = diameter / 6.0
    g = jnp.exp(-(dx * dx + dy * dy)
                / (2.0 * sigma * sigma)[:, None, None])
    inside = (jnp.abs(dx) <= radius[:, None, None]) & \
        (jnp.abs(dy) <= radius[:, None, None])
    g = g * inside * valid[:, None, None]
    return jnp.max(g, axis=0)


def corner_targets(gt_bboxes, gt_valid, feat_h, feat_w, img_h, img_w,
                   min_overlap=0.3):
    """Corner heatmap/offset targets for one image (reference
    ``corner_head.py:299-466`` ``get_targets``; single fg class).

    Returns dict of: tl_heat/br_heat ``(H, W)``, tl_off/br_off
    ``(H, W, 2)``, tl_pos/br_pos ``(G, 2)`` int corner cells (for
    embedding gathers), off masks baked as heat==1.
    """
    wr = feat_w / img_w
    hr = feat_h / img_h
    x1, y1, x2, y2 = (gt_bboxes[:, i] for i in range(4))
    sx1, sy1 = x1 * wr, y1 * hr
    sx2, sy2 = x2 * wr, y2 * hr
    lx = jnp.minimum(sx1, feat_w - 1).astype(jnp.int32)
    ty = jnp.minimum(sy1, feat_h - 1).astype(jnp.int32)
    rx = jnp.minimum(sx2, feat_w - 1).astype(jnp.int32)
    by = jnp.minimum(sy2, feat_h - 1).astype(jnp.int32)
    bw = jnp.ceil(sx2 - sx1)
    bh = jnp.ceil(sy2 - sy1)
    radius = jnp.maximum(
        jnp.floor(gaussian_radius(bh, bw, min_overlap)), 0.0)
    v = gt_valid.astype(jnp.float32)
    tl_heat = _paint_gaussians(lx.astype(jnp.float32),
                               ty.astype(jnp.float32), radius, v,
                               feat_h, feat_w)
    br_heat = _paint_gaussians(rx.astype(jnp.float32),
                               by.astype(jnp.float32), radius, v,
                               feat_h, feat_w)
    # exact-corner cells carry heat 1 (gaussian center) — but only where
    # a valid gt lands; paint them explicitly so offset masks (heat==1)
    # are exact even for degenerate radii
    flat_tl = jnp.zeros((feat_h * feat_w,))
    flat_br = jnp.zeros((feat_h * feat_w,))
    tl_idx = ty * feat_w + lx
    br_idx = by * feat_w + rx
    flat_tl = flat_tl.at[tl_idx].max(v)
    flat_br = flat_br.at[br_idx].max(v)
    tl_heat = jnp.maximum(tl_heat, flat_tl.reshape(feat_h, feat_w))
    br_heat = jnp.maximum(br_heat, flat_br.reshape(feat_h, feat_w))

    # offsets at the exact corner cells (sub-cell fraction)
    def scatter_off(idx, ox, oy, v):
        off = jnp.zeros((feat_h * feat_w, 2))
        upd = jnp.stack([ox, oy], -1) * v[:, None]
        # duplicate corners: last write wins (reference loop order)
        off = off.at[jnp.where(v > 0, idx, feat_h * feat_w)].set(upd,
                     mode="drop")
        return off.reshape(feat_h, feat_w, 2)

    tl_off = scatter_off(tl_idx, sx1 - lx, sy1 - ty, v)
    br_off = scatter_off(br_idx, sx2 - rx, sy2 - by, v)
    return dict(tl_heat=tl_heat, br_heat=br_heat,
                tl_off=tl_off, br_off=br_off,
                tl_pos=jnp.stack([ty, lx], -1),
                br_pos=jnp.stack([by, rx], -1))


class BiCornerPool(nn.Module):
    """reference ``corner_head.py:15-73``."""
    directions: Any
    feat_channels: int = 128
    out_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def cbr(v, c, k, name, act=True):
            v = nn.Conv(c, (k, k), padding=[(k // 2,) * 2] * 2,
                        use_bias=False, dtype=self.dtype,
                        name=name + "_conv")(v)
            v = nn.GroupNorm(num_groups=None, group_size=1,
                             dtype=self.dtype, name=name + "_bn")(v)
            return nn.relu(v) if act else v

        d1 = corner_pool(cbr(x, self.feat_channels, 3, "d1"),
                         self.directions[0])
        d2 = corner_pool(cbr(x, self.feat_channels, 3, "d2"),
                         self.directions[1])
        aft = cbr(d1 + d2, self.out_channels, 3, "aftpool", act=False)
        skip = cbr(x, self.out_channels, 1, "conv1", act=False)
        return cbr(nn.relu(aft + skip), self.out_channels, 3, "conv2")


class CornerHead(nn.Module):
    """reference ``corner_head.py:76-297``; per-channel GroupNorm(1)
    replaces BN (framework FrozenBatchNorm convention does not fit the
    scratch-trained CornerNet recipe)."""
    num_classes: int = 1
    in_channels: int = 256
    num_feat_levels: int = 2
    corner_emb_channels: int = 1
    dtype: Any = jnp.float32

    def _branch(self, x, out_c, name):
        h = nn.Conv(self.in_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name=name + "_c0")(x)
        h = nn.relu(h)
        import math
        bias = nn.initializers.constant(
            -math.log((1 - 0.1) / 0.1)) if "heat" in name \
            else nn.initializers.zeros
        return nn.Conv(out_c, (1, 1), dtype=self.dtype, bias_init=bias,
                       name=name + "_c1")(h).astype(jnp.float32)

    @nn.compact
    def __call__(self, feats):
        """feats: list of (B, H, W, C), one per hourglass stack.
        Returns per-level dicts of tl/br heat, emb, off."""
        outs = []
        for i, x in enumerate(feats[-self.num_feat_levels:]):
            tl_pool = BiCornerPool(("top", "left"),
                                   out_channels=self.in_channels,
                                   dtype=self.dtype,
                                   name=f"tl_pool{i}")(x)
            br_pool = BiCornerPool(("bottom", "right"),
                                   out_channels=self.in_channels,
                                   dtype=self.dtype,
                                   name=f"br_pool{i}")(x)
            out = dict(
                tl_heat=self._branch(tl_pool, self.num_classes,
                                     f"tl_heat{i}"),
                br_heat=self._branch(br_pool, self.num_classes,
                                     f"br_heat{i}"),
                tl_off=self._branch(tl_pool, 2, f"tl_off{i}"),
                br_off=self._branch(br_pool, 2, f"br_off{i}"))
            if self.corner_emb_channels > 0:
                out["tl_emb"] = self._branch(tl_pool,
                                             self.corner_emb_channels,
                                             f"tl_emb{i}")
                out["br_emb"] = self._branch(br_pool,
                                             self.corner_emb_channels,
                                             f"br_emb{i}")
            outs.append(out)
        return outs


def local_maximum(heat, kernel=3):
    """Keep only 3x3 local maxima (reference ``_local_maximum``)."""
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max, (1, kernel, kernel),
        (1, 1, 1), [(0, 0), (pad, pad), (pad, pad)])
    return jnp.where(hmax == heat, heat, 0.0)


def decode_corners(out, img_h, img_w, k=100, kernel=3,
                   distance_threshold=0.5, num_dets=1000):
    """Pair top-k corners into boxes for ONE image (reference
    ``decode_heatmap``; single fg class).

    ``out``: level dict with (H, W, C) arrays.  Returns
    (boxes (num_dets, 4), scores (num_dets,)).
    """
    h, w = out["tl_heat"].shape[:2]
    tl = jax.nn.sigmoid(out["tl_heat"][..., 0])[None]
    br = jax.nn.sigmoid(out["br_heat"][..., 0])[None]
    tl = local_maximum(tl, kernel)[0]
    br = local_maximum(br, kernel)[0]

    tl_scores, tl_inds = jax.lax.top_k(tl.reshape(-1), k)
    br_scores, br_inds = jax.lax.top_k(br.reshape(-1), k)
    tl_y = (tl_inds // w).astype(jnp.float32)
    tl_x = (tl_inds % w).astype(jnp.float32)
    br_y = (br_inds // w).astype(jnp.float32)
    br_x = (br_inds % w).astype(jnp.float32)
    tl_o = out["tl_off"].reshape(-1, 2)[tl_inds]
    br_o = out["br_off"].reshape(-1, 2)[br_inds]
    tl_x, tl_y = tl_x + tl_o[:, 0], tl_y + tl_o[:, 1]
    br_x, br_y = br_x + br_o[:, 0], br_y + br_o[:, 1]

    # (K, K) pairing
    sx, sy = img_w / w, img_h / h
    x1 = jnp.maximum(tl_x[:, None] * sx, 0.0)
    y1 = jnp.maximum(tl_y[:, None] * sy, 0.0)
    x2 = jnp.maximum(br_x[None, :] * sx, 0.0)
    y2 = jnp.maximum(br_y[None, :] * sy, 0.0)
    scores = (tl_scores[:, None] + br_scores[None, :]) / 2.0
    if "tl_emb" in out:
        e1 = out["tl_emb"].reshape(-1)[tl_inds]
        e2 = out["br_emb"].reshape(-1)[br_inds]
        dists = jnp.abs(e1[:, None] - e2[None, :])
        scores = jnp.where(dists > distance_threshold, -1.0, scores)
    scores = jnp.where((x2 <= x1) | (y2 <= y1), -1.0, scores)

    flat_scores = scores.reshape(-1)
    top_s, top_i = jax.lax.top_k(flat_scores, num_dets)
    kx1, ky1, kx2, ky2 = jnp.broadcast_arrays(x1, y1, x2, y2)
    boxes = jnp.stack([kx1, ky1, kx2, ky2], -1).reshape(-1, 4)[top_i]
    return boxes, top_s
