"""FOA offset math vs reference semantics, computed by hand.

reference: ``offset_head_expand_feature.py`` —
- ``expand_gt_offset``: rotate GT offset by the branch angle
  (θ' = θ − angle);
- for 90/270 branches the encode swaps x/y in AND out
  (``_offset_target_single:294-300``);
- ``offset_fusion`` (max model, 4 branches): x-candidates are
  [o0.x, o1.y, o2.x, o3.y], y-candidates [o0.y, o1.x, o2.y, o3.x],
  fused = max|.| per axis with the 0° branch polarity.
"""

import math

import jax.numpy as jnp
import numpy as np

from bonai_tpu.models.roi_heads.offset_heads import (foa_offset_targets,
                                                     foa_offset_fusion)

ROTS = (0, 90, 180, 270)


def _ref_rotate(off, angle_deg):
    # reference offset_rotate: xy -> (len, θ) -> θ - angle -> xy
    length = math.hypot(*off)
    theta = math.atan2(off[1], off[0]) - math.radians(angle_deg)
    return [length * math.cos(theta), length * math.sin(theta)]


def _ref_encode(box, off, swap):
    pw = box[2] - box[0]
    ph = box[3] - box[1]
    if swap:
        # encode(swapped input)[swapped output]:
        # dx = off_y/pw, dy = off_x/ph, then swap back
        enc = [off[1] / pw / 0.5, off[0] / ph / 0.5]
        return [enc[1], enc[0]]
    return [off[0] / pw / 0.5, off[1] / ph / 0.5]


def test_foa_targets_match_reference_math():
    boxes = np.array([[10., 20., 50., 100.],
                      [0., 0., 30., 30.]], np.float32)
    offs = np.array([[6., -10.], [-3., 4.]], np.float32)
    got = np.asarray(foa_offset_targets(jnp.asarray(boxes),
                                        jnp.asarray(offs), ROTS))
    for e, angle in enumerate(ROTS):
        for r in range(2):
            rot = _ref_rotate(offs[r], angle)
            exp = _ref_encode(boxes[r], rot, swap=(angle % 180 == 90))
            np.testing.assert_allclose(got[e, r], exp, atol=1e-5,
                                       err_msg=f"branch {angle} roi {r}")


def test_foa_fusion_matches_reference():
    # hand-built per-branch predictions (E=4, N=1, 2)
    pred = jnp.asarray(np.array([
        [[2.0, -1.0]],     # 0°   -> x cand 2.0,  y cand -1.0
        [[-3.0, 0.5]],     # 90°  -> x cand 0.5,  y cand -3.0
        [[-2.5, 0.8]],     # 180° -> x cand -2.5, y cand 0.8
        [[1.2, -2.8]],     # 270° -> x cand -2.8, y cand 1.2
    ], np.float32))
    fused = np.asarray(foa_offset_fusion(pred, ROTS))[0]
    # max|x| over [2.0, 0.5, -2.5, -2.8] = 2.8; polarity from 0° x (=+)
    # max|y| over [-1.0, -3.0, 0.8, 1.2] = 3.0; polarity from 0° y (=-)
    np.testing.assert_allclose(fused, [2.8, -3.0], atol=1e-6)


def test_foa_two_branch_fusion():
    pred = jnp.asarray(np.array([
        [[1.0, -2.0]],     # 0°
        [[3.0, 0.5]],      # 90° -> x cand 0.5, y cand 3.0
    ], np.float32))
    fused = np.asarray(foa_offset_fusion(pred, (0, 90)))[0]
    np.testing.assert_allclose(fused, [1.0, -3.0], atol=1e-6)


def test_foa_rotation_consistency_with_feature_rot():
    """A 90°-rotated feature's offset, decoded with the swap convention,
    must invert back to the 0° branch target (self-consistency of the
    training contract)."""
    import jax
    from bonai_tpu.core.boxes import offset_rotate
    boxes = jnp.asarray([[0., 0., 40., 20.]])
    off = jnp.asarray([[8., -6.]])
    t = foa_offset_targets(boxes, off, ROTS)
    # decode branch 0 trivially
    pw, ph = 40., 20.
    np.testing.assert_allclose(np.asarray(t[0, 0]),
                               [8 / pw / 0.5, -6 / ph / 0.5], atol=1e-6)
    # branch 90: rotated offset is (y, -x) = (-6, -8); encode with swap:
    # [enc_y, enc_x] where enc = [rot_y/pw, rot_x/ph] / 0.5
    np.testing.assert_allclose(np.asarray(t[1, 0]),
                               [-6 / ph / 0.5, -8 / pw / 0.5], atol=1e-5)
