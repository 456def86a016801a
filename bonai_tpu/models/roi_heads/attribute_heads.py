"""Experimental per-building attribute heads: height, angle, joint
offset+height, side-face segmentation, dense offset-field.

reference: ``mmdet/models/roi_heads/test_mixins.py:293-445`` (Angle/
OffsetHeight/Height/OffsetField/OffsetReweight test mixins) and the
``with_height``/``with_angle``/``with_side_face``/``with_offset_field``
hooks in ``mmdet/models/roi_heads/base_roi_head.py:52-73``.  The head
modules themselves were removed from the public reference repo, so the
architectures here are reconstructed from the mixin call signatures
(conv+fc RoI regressors like ``offset_head.py:24-105``; FCN-style dense
heads like ``fcn_mask_head.py``) and re-designed TPU-first:

- All heads take fixed-shape padded RoI batches ``(B*P, S, S, C)`` —
  no per-image python loops; invalid rows are masked in the loss.
- Dense supervision (side-face maps / offset fields) is cropped per-RoI
  with the same fused ``roi_align`` used for features (spatial_scale=1
  on the image-resolution map) instead of cv2 crops on host.
- The reweight path (``test_mixins.py:408-445``) resizes
  ``sigmoid(side_face + mask)`` to the offset RoI grid with
  ``jax.image.resize`` (== F.interpolate bilinear) and scales the RoI
  features before the offset head.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _kaiming():
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _fc_init():
    return nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


class _ConvFCTrunk(nn.Module):
    """Shared conv3x3×N + FC×M trunk used by the RoI attribute regressors
    (same shape as ``offset_head.py:40-77``)."""
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_out_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        kernel_init=_kaiming(), name=f"conv{i}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                                 kernel_init=_fc_init(), name=f"fc{i}")(x))
        return x


class HeightHead(nn.Module):
    """Per-RoI building-height regressor (``HeightTestMixin``,
    ``test_mixins.py:339-365``; ``with_height`` hook)."""
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        t = _ConvFCTrunk(self.num_convs, self.num_fcs,
                         self.conv_out_channels, self.fc_out_channels,
                         self.dtype, name="trunk")(x)
        out = nn.Dense(1, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name="fc_height")(t)
        return out.astype(jnp.float32)


class OffsetHeightHead(nn.Module):
    """Joint offset+height regressor sharing one trunk
    (``OffsetHeightTestMixin``, ``test_mixins.py:302-337``)."""
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    reg_num: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        t = _ConvFCTrunk(self.num_convs, self.num_fcs,
                         self.conv_out_channels, self.fc_out_channels,
                         self.dtype, name="trunk")(x)
        off = nn.Dense(self.reg_num, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name="fc_offset")(t)
        hgt = nn.Dense(1, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name="fc_height")(t)
        return off.astype(jnp.float32), hgt.astype(jnp.float32)


class AngleHead(nn.Module):
    """Image-level off-nadir-angle regressor (``AngleTestMixin``,
    ``test_mixins.py:293-300``: ``angle_pred = self.angle_head(x)`` on the
    FPN tuple; consumed per-image in radians by ``SemiRPNHead``,
    ``semi_rpn_head.py:51-60``).

    Runs two 3x3 convs on the coarsest FPN level, global-average-pools,
    and regresses one radian value per image.
    """
    in_channels: int = 256
    conv_out_channels: int = 256
    num_convs: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        x = feats[-1]                       # (B, H, W, C) coarsest level
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_out_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        kernel_init=_kaiming(), name=f"conv{i}")(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))        # GAP
        out = nn.Dense(1, dtype=self.dtype,
                       kernel_init=nn.initializers.normal(0.01),
                       name="fc_angle")(x)
        return out.astype(jnp.float32)      # (B, 1) radians


class SideFaceHead(nn.Module):
    """FCN head predicting the visible side-face region per RoI
    (``with_side_face`` hook, ``base_roi_head.py:68-69``; consumed by the
    reweight mixin ``test_mixins.py:408-445``).  Same architecture family
    as ``fcn_mask_head.py``: conv×4 + 2x deconv + 1x1, one class."""
    num_convs: int = 4
    conv_out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_out_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        kernel_init=_kaiming(), name=f"conv{i}")(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(self.conv_out_channels, (2, 2), strides=(2, 2),
                             dtype=self.dtype, kernel_init=_kaiming(),
                             name="upsample")(x)
        x = nn.relu(x)
        out = nn.Conv(1, (1, 1), dtype=self.dtype,
                      kernel_init=_kaiming(), name="conv_logits")(x)
        return out.astype(jnp.float32)      # (N, 2S, 2S, 1) logits


class OffsetFieldHead(nn.Module):
    """FCN head predicting a dense per-pixel (dx, dy) offset field inside
    each RoI (``OffsetFieldTestMixin``, ``test_mixins.py:367-406``; dense
    GT loaded by ``loading.py:441-583`` ``_load_offset_field``)."""
    num_convs: int = 4
    conv_out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_out_channels, (3, 3),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        kernel_init=_kaiming(), name=f"conv{i}")(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(self.conv_out_channels, (2, 2), strides=(2, 2),
                             dtype=self.dtype, kernel_init=_kaiming(),
                             name="upsample")(x)
        x = nn.relu(x)
        out = nn.Conv(2, (1, 1), dtype=self.dtype,
                      kernel_init=_kaiming(), name="conv_field")(x)
        return out.astype(jnp.float32)      # (N, 2S, 2S, 2)


# ---------------------------------------------------------------- coding

def height2delta(heights, means=(0.0,), stds=(4.0,)):
    """Encode building heights for regression (z-score; the reference's
    height coder was removed with the head — semantics reconstructed from
    ``get_heights(pred, bboxes, scale_factor, rescale)``)."""
    return (jnp.asarray(heights) - means[0]) / stds[0]


def delta2height(deltas, means=(0.0,), stds=(4.0,)):
    """Decode to non-negative heights."""
    return jnp.maximum(jnp.asarray(deltas) * stds[0] + means[0], 0.0)


def offset_field_to_offsets(field, mask_logits):
    """Aggregate a dense per-RoI offset field into one instance offset,
    weighting by the predicted roof mask (``OffsetFieldTestMixin``
    ``get_offset(mask_pred, offset_field_pred, ...)``,
    ``test_mixins.py:389-404``).

    Args:
      field: ``(N, S, S, 2)`` per-pixel (dx, dy).
      mask_logits: ``(N, S', S', 1)`` roof-mask logits (resized if needed).
    Returns ``(N, 2)``.
    """
    n, s = field.shape[0], field.shape[1]
    if mask_logits.shape[1] != s:
        mask_logits = jax.image.resize(mask_logits,
                                       (n, s, s, mask_logits.shape[-1]),
                                       method="bilinear")
    w = jax.nn.sigmoid(mask_logits[..., :1])
    num = jnp.sum(field * w, axis=(1, 2))
    den = jnp.maximum(jnp.sum(w, axis=(1, 2)), 1e-6)
    return num / den


def reweight_roi_feats(offset_feats, mask_logits, side_face_logits):
    """Scale offset-RoI features by the roof+side-face saliency
    (``OffsetReweightTestMixin``, ``test_mixins.py:424-441``):
    ``w = (sigmoid(resize(side_face + mask, SxS)) + 1) / 2``."""
    n, s = offset_feats.shape[0], offset_feats.shape[1]
    fused = side_face_logits + mask_logits
    fused = jax.image.resize(fused, (n, s, s, fused.shape[-1]),
                             method="bilinear")
    w = (jax.nn.sigmoid(fused) + 1.0) * 0.5
    return offset_feats * w.astype(offset_feats.dtype)
