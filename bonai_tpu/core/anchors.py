"""Anchor generation (static, computed once at trace time).

reference: ``mmdet/core/anchor/anchor_generator.py:10-330``.  Anchors are
pure functions of static feature-map sizes, so we build them in numpy and
embed them as constants in the compiled graph.
"""

from __future__ import annotations

import numpy as np

from ..registry import Registry, build_from_cfg

ANCHOR_GENERATORS = Registry("anchor_generator")


def build_anchor_generator(cfg, **default_args):
    return build_from_cfg(cfg, ANCHOR_GENERATORS, default_args)


@ANCHOR_GENERATORS.register_module()
class AnchorGenerator:
    def __init__(self, strides, ratios, scales=None, base_sizes=None,
                 scale_major=True, octave_base_scale=None,
                 scales_per_octave=None, centers=None, center_offset=0.):
        self.strides = [(s, s) if isinstance(s, (int, float)) else tuple(s)
                        for s in strides]
        self.base_sizes = ([min(s) for s in self.strides]
                           if base_sizes is None else list(base_sizes))
        if scales is not None:
            self.scales = np.asarray(scales, np.float32)
        elif octave_base_scale is not None and scales_per_octave is not None:
            octave_scales = np.array(
                [2 ** (i / scales_per_octave) for i in range(scales_per_octave)])
            self.scales = (octave_scales * octave_base_scale).astype(np.float32)
        else:
            raise ValueError("either scales or octave_base_scale+scales_per_"
                             "octave must be set")
        self.ratios = np.asarray(ratios, np.float32)
        self.scale_major = scale_major
        self.centers = centers
        self.center_offset = center_offset
        self.base_anchors = self.gen_base_anchors()

    @property
    def num_levels(self):
        return len(self.strides)

    @property
    def num_base_anchors(self):
        return [a.shape[0] for a in self.base_anchors]

    def gen_base_anchors(self):
        out = []
        for i, base_size in enumerate(self.base_sizes):
            center = self.centers[i] if self.centers is not None else None
            out.append(self._single_level_base_anchors(
                base_size, self.scales, self.ratios, center))
        return out

    def _single_level_base_anchors(self, base_size, scales, ratios,
                                   center=None):
        w = h = float(base_size)
        if center is None:
            x_c = self.center_offset * w
            y_c = self.center_offset * h
        else:
            x_c, y_c = center
        h_ratios = np.sqrt(ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * scales[None, :]).reshape(-1)
        else:
            ws = (w * scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * scales[:, None] * h_ratios[None, :]).reshape(-1)
        return np.stack([x_c - 0.5 * ws, y_c - 0.5 * hs,
                         x_c + 0.5 * ws, y_c + 0.5 * hs], axis=-1)

    def grid_anchors(self, featmap_sizes):
        """list of ``(H*W*A, 4)`` float32 arrays, row-major over (y, x, a)."""
        assert len(featmap_sizes) == self.num_levels
        return [self._single_level_grid_anchors(
            self.base_anchors[i], featmap_sizes[i], self.strides[i])
            for i in range(self.num_levels)]

    @staticmethod
    def _single_level_grid_anchors(base_anchors, featmap_size, stride):
        feat_h, feat_w = featmap_size
        shift_x = np.arange(0, feat_w, dtype=np.float32) * stride[0]
        shift_y = np.arange(0, feat_h, dtype=np.float32) * stride[1]
        # row-major (first feat_w entries = first row), matching reference
        xx = np.tile(shift_x, feat_h)
        yy = np.repeat(shift_y, feat_w)
        shifts = np.stack([xx, yy, xx, yy], axis=-1)
        all_anchors = base_anchors[None, :, :] + shifts[:, None, :]
        return all_anchors.reshape(-1, 4).astype(np.float32)

    def rotated_base_anchors(self):
        return None


class LegacyAnchorGenerator(AnchorGenerator):
    """MMDet v1.x anchors (reference ``anchor_generator.py:475-560``;
    the legacy_1.x config family): center offset applies to ``size - 1``,
    widths/heights are minused by 1 at the corners, corners quantized."""

    def _single_level_base_anchors(self, base_size, scales, ratios,
                                   center=None):
        w = h = float(base_size)
        if center is None:
            x_c = self.center_offset * (w - 1)
            y_c = self.center_offset * (h - 1)
        else:
            x_c, y_c = center
        h_ratios = np.sqrt(ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * scales[None, :]).reshape(-1)
        else:
            ws = (w * scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * scales[:, None] * h_ratios[None, :]).reshape(-1)
        return np.round(np.stack(
            [x_c - 0.5 * (ws - 1), y_c - 0.5 * (hs - 1),
             x_c + 0.5 * (ws - 1), y_c + 0.5 * (hs - 1)], axis=-1))

    def valid_flags(self, featmap_sizes, pad_shape):
        """Per-level bool arrays marking anchors whose grid cell lies inside
        the un-padded image region (reference: ``anchor_generator.py:273-330``)."""
        flags = []
        for i in range(self.num_levels):
            feat_h, feat_w = featmap_sizes[i]
            h, w = pad_shape[:2]
            valid_h = min(int(np.ceil(h / self.strides[i][1])), feat_h)
            valid_w = min(int(np.ceil(w / self.strides[i][0])), feat_w)
            vx = np.zeros(feat_w, bool)
            vy = np.zeros(feat_h, bool)
            vx[:valid_w] = True
            vy[:valid_h] = True
            vv = (vy[:, None] & vx[None, :]).reshape(-1)
            flags.append(np.repeat(vv, self.num_base_anchors[i]))
        return flags


@ANCHOR_GENERATORS.register_module()
class SSDAnchorGenerator(AnchorGenerator):
    """SSD anchors: per-level ``min_size``/``max_size`` pairs derived
    from ``basesize_ratio_range`` (reference:
    ``mmdet/core/anchor/anchor_generator.py:351-455``).  Base anchors
    per level are ``[min@1:1, sqrt(min*max)@1:1, min@1/r, min@r, ...]``
    (the reference's scale-minor flatten + index reorder), so levels can
    carry different anchor counts (4 or 6)."""

    def __init__(self, strides, ratios, basesize_ratio_range,
                 input_size=300, scale_major=False):
        self.strides = [(s, s) if isinstance(s, (int, float)) else tuple(s)
                        for s in strides]
        self.input_size = int(input_size)
        self.centers = [(s[0] / 2.0, s[1] / 2.0) for s in self.strides]
        self.basesize_ratio_range = tuple(basesize_ratio_range)
        min_ratio = int(self.basesize_ratio_range[0] * 100)
        max_ratio = int(self.basesize_ratio_range[1] * 100)
        step = int(np.floor(max_ratio - min_ratio) / (len(strides) - 2))
        min_sizes, max_sizes = [], []
        for ratio in range(min_ratio, max_ratio + 1, step):
            min_sizes.append(int(self.input_size * ratio / 100))
            max_sizes.append(int(self.input_size * (ratio + step) / 100))
        # the first (highest-resolution) level uses a fixed smaller pair
        # keyed on (input_size, range start) — reference :392-414
        head = {(300, 15): (7, 15), (300, 20): (10, 20),
                (512, 10): (4, 10), (512, 15): (7, 15)}.get(
                    (self.input_size, min_ratio),
                    (min_ratio // 2, min_ratio))   # generic fallback
        min_sizes.insert(0, int(self.input_size * head[0] / 100))
        max_sizes.insert(0, int(self.input_size * head[1] / 100))
        min_sizes = min_sizes[:len(strides)]
        max_sizes = max_sizes[:len(strides)]
        self.level_scales = [np.asarray(
            [1.0, np.sqrt(mx / mn)], np.float32)
            for mn, mx in zip(min_sizes, max_sizes)]
        self.level_ratios = []
        for r in ratios:
            ar = [1.0]
            for x in r:
                ar += [1.0 / x, float(x)]
            self.level_ratios.append(np.asarray(ar, np.float32))
        self.base_sizes = min_sizes
        self.scale_major = scale_major
        self.center_offset = 0.0
        self.base_anchors = self.gen_base_anchors()

    def gen_base_anchors(self):
        out = []
        for i, base_size in enumerate(self.base_sizes):
            a = self._single_level_base_anchors(
                base_size, self.level_scales[i], self.level_ratios[i],
                self.centers[i])
            idx = list(range(len(self.level_ratios[i])))
            idx.insert(1, len(idx))
            out.append(a[np.asarray(idx)])
        return out


@ANCHOR_GENERATORS.register_module()
class LegacySSDAnchorGenerator(SSDAnchorGenerator):
    """MMDet v1.x SSD anchors (reference ``anchor_generator.py:563-600``,
    the legacy_1.x ssd300_coco_v1 config): centers sit at
    ``(stride - 1) / 2`` and base anchors use the v1.x ``size - 1``
    corner convention."""

    # v1.x corner convention comes from the legacy base-anchor formula
    _single_level_base_anchors = \
        LegacyAnchorGenerator._single_level_base_anchors

    def __init__(self, strides, ratios, basesize_ratio_range,
                 input_size=300, scale_major=False):
        super().__init__(strides, ratios, basesize_ratio_range,
                         input_size, scale_major)
        self.centers = [((s[0] - 1) / 2.0, (s[1] - 1) / 2.0)
                        for s in self.strides]
        self.base_anchors = self.gen_base_anchors()


@ANCHOR_GENERATORS.register_module()
class RAnchorGenerator(AnchorGenerator):
    """Rotated anchors — adds an ``angles`` axis; anchors become
    ``(xc, yc, w, h, θ)`` (reference:
    ``mmdet/core/anchor/ranchor_generator.py:9-60``, used by the
    rotated-box experiments of §2.8)."""

    def __init__(self, *args, angles=(0.0,), **kwargs):
        self.angles = [float(a) for a in angles]
        super().__init__(*args, **kwargs)

    def _single_level_base_anchors(self, base_size, scales, ratios,
                                   center=None):
        aligned = super()._single_level_base_anchors(
            base_size, scales, ratios, center)          # (A, 4) xyxy
        xc = (aligned[:, 0] + aligned[:, 2]) * 0.5
        yc = (aligned[:, 1] + aligned[:, 3]) * 0.5
        w = aligned[:, 2] - aligned[:, 0]
        h = aligned[:, 3] - aligned[:, 1]
        out = []
        for ang in self.angles:
            theta = np.full_like(xc, np.deg2rad(ang))
            out.append(np.stack([xc, yc, w, h, theta], axis=-1))
        return np.concatenate(out, axis=0)              # (A*angles, 5)

    @staticmethod
    def _single_level_grid_anchors(base_anchors, featmap_size, stride):
        feat_h, feat_w = featmap_size
        shift_x = np.arange(0, feat_w, dtype=np.float32) * stride[0]
        shift_y = np.arange(0, feat_h, dtype=np.float32) * stride[1]
        xx = np.tile(shift_x, feat_h)
        yy = np.repeat(shift_y, feat_w)
        zeros = np.zeros_like(xx)
        shifts = np.stack([xx, yy, zeros, zeros, zeros], axis=-1)
        all_anchors = base_anchors[None, :, :] + shifts[:, None, :]
        return all_anchors.reshape(-1, 5).astype(np.float32)
