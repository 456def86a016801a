import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu.core import (AnchorGenerator, bbox_overlaps, bbox2delta,
                            delta2bbox, offset2delta, delta2offset,
                            max_iou_assign, random_sample, nms, soft_nms,
                            batched_nms, multiclass_nms)
from bonai_tpu.core.boxes import offset_rotate


def np_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    a2 = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(a1[:, None] + a2[None, :] - inter, 1e-6)


def test_bbox_overlaps_reference_values():
    # the doctest values from the reference iou2d_calculator
    b1 = jnp.array([[0, 0, 10, 10], [10, 10, 20, 20], [32, 32, 38, 42]],
                   jnp.float32)
    b2 = jnp.array([[0, 0, 10, 20], [0, 10, 10, 19], [10, 10, 20, 20]],
                   jnp.float32)
    iou = bbox_overlaps(b1, b2)
    expect = np.array([[0.5, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(iou), expect, atol=1e-5)


def test_delta_coder_roundtrip():
    rng = np.random.RandomState(0)
    props = rng.uniform(0, 500, (32, 2))
    props = np.concatenate([props, props + rng.uniform(5, 100, (32, 2))], 1)
    gts = rng.uniform(0, 500, (32, 2))
    gts = np.concatenate([gts, gts + rng.uniform(5, 100, (32, 2))], 1)
    means, stds = (0., 0., 0., 0.), (0.1, 0.1, 0.2, 0.2)
    d = bbox2delta(jnp.asarray(props), jnp.asarray(gts), means, stds)
    rec = delta2bbox(jnp.asarray(props), d, means, stds)
    np.testing.assert_allclose(np.asarray(rec), gts, rtol=1e-4, atol=1e-2)


def test_delta2bbox_clip_and_ratio():
    rois = jnp.array([[0., 0., 10., 10.]])
    # huge dw must be clipped by wh_ratio_clip
    deltas = jnp.array([[0., 0., 50., 0.]])
    out = delta2bbox(rois, deltas, max_shape=(20, 20))
    assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 20)


def test_offset_coder_matches_reference_math():
    props = jnp.array([[0., 0., 10., 20.], [5., 5., 25., 15.]])
    offs = jnp.array([[2., -4.], [-10., 5.]])
    enc = offset2delta(props, offs)  # dx = gx/pw / 0.5
    np.testing.assert_allclose(
        np.asarray(enc),
        [[2 / 10 / 0.5, -4 / 20 / 0.5], [-10 / 20 / 0.5, 5 / 10 / 0.5]],
        atol=1e-6)
    dec = delta2offset(props, enc)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(offs), atol=1e-5)
    # clamp by max_shape
    dec2 = delta2offset(props, enc * 1e4, max_shape=(100, 200))
    assert np.abs(np.asarray(dec2)[:, 0]).max() <= 200
    assert np.abs(np.asarray(dec2)[:, 1]).max() <= 100


def test_offset_rotate_quarter_turns():
    off = jnp.array([[3., 4.]])
    # reference offset_rotate: θ' = θ - angle
    np.testing.assert_allclose(np.asarray(offset_rotate(off, 0)),
                               [[3., 4.]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(offset_rotate(off, 90)),
                               [[4., -3.]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(offset_rotate(off, 180)),
                               [[-3., -4.]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(offset_rotate(off, 270)),
                               [[-4., 3.]], atol=1e-6)


def test_anchor_generator_matches_reference_math():
    gen = AnchorGenerator(strides=[4, 8, 16, 32, 64], ratios=[0.5, 1.0, 2.0],
                          scales=[8])
    assert gen.num_levels == 5
    base = gen.base_anchors[0]   # stride 4, scale 8 -> base size 32
    # ratio 1.0 anchor: centered at 0, 32x32
    np.testing.assert_allclose(base[1], [-16, -16, 16, 16], atol=1e-4)
    # ratio 0.5: h/w = 0.5 -> w = 32*sqrt(2), h = 32/sqrt(2)
    w = 32 * np.sqrt(2)
    np.testing.assert_allclose(base[0], [-w / 2, -w / 4, w / 2, w / 4],
                               atol=1e-3)
    gen1 = AnchorGenerator(strides=[4], ratios=[0.5, 1.0, 2.0], scales=[8])
    anchors = gen1.grid_anchors([(2, 3)])[0]
    assert anchors.shape == (2 * 3 * 3, 4)
    # second grid cell shifts x by stride
    np.testing.assert_allclose(anchors[3] - anchors[0], [4, 0, 4, 0],
                               atol=1e-5)
    # row-major: cell (1, 0) is index feat_w*A
    np.testing.assert_allclose(anchors[9] - anchors[0], [0, 4, 0, 4],
                               atol=1e-5)


def _greedy_nms_np(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    supp = np.zeros(len(boxes), bool)
    for i in order:
        if supp[i]:
            continue
        keep.append(i)
        iou = np_iou(boxes[i:i + 1], boxes)[0]
        supp |= iou > thr
        supp[i] = True
    return sorted(keep)


@pytest.mark.parametrize("n,tile", [(50, 16), (300, 64), (700, 256)])
def test_nms_matches_sequential_greedy(n, tile):
    rng = np.random.RandomState(n)
    ctr = rng.uniform(0, 200, (n, 2))
    wh = rng.uniform(5, 60, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    keep = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, tile_size=tile)
    got = sorted(np.nonzero(np.asarray(keep))[0].tolist())
    expect = _greedy_nms_np(boxes, scores, 0.5)
    assert got == expect


def test_nms_respects_valid_mask():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]],
                      jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7])
    keep = nms(boxes, scores, 0.5,
               valid=jnp.array([False, True, True]))
    np.testing.assert_array_equal(np.asarray(keep), [False, True, True])


def test_batched_nms_no_cross_class_suppression():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.array([0.9, 0.8])
    keep = batched_nms(boxes, scores, jnp.array([0, 1]), 0.5)
    assert bool(keep[0]) and bool(keep[1])
    keep_same = batched_nms(boxes, scores, jnp.array([0, 0]), 0.5)
    assert bool(keep_same[0]) and not bool(keep_same[1])


def _soft_nms_np(boxes, scores, thr, max_out, min_score=1e-3):
    scores = scores.copy()
    out = np.zeros_like(scores)
    for _ in range(max_out):
        i = np.argmax(scores)
        if scores[i] < min_score:
            break
        out[i] = scores[i]
        iou = np_iou(boxes[i:i + 1], boxes)[0]
        decay = np.where(iou > thr, 1 - iou, 1.0)
        scores *= decay
        scores[i] = 0
        scores[scores < min_score] = 0
    return out


def test_soft_nms_matches_sequential():
    rng = np.random.RandomState(3)
    n = 80
    ctr = rng.uniform(0, 100, (n, 2))
    wh = rng.uniform(10, 40, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    got, _ = soft_nms(jnp.asarray(boxes), jnp.asarray(scores),
                      iou_threshold=0.5, max_out=n)
    expect = _soft_nms_np(boxes, scores, 0.5, n)
    np.testing.assert_allclose(np.asarray(got), expect, atol=1e-4)


def test_multiclass_nms_fixed_shapes():
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60],
                       [0, 0, 0, 0]], jnp.float32)
    scores = jnp.array([[0.9, 0.1], [0.8, 0.2], [0.7, 0.3], [0.0, 1.0]])
    b, s, l, v = multiclass_nms(boxes, scores, score_thr=0.05,
                                nms_cfg=dict(type="nms", iou_threshold=0.5),
                                max_per_img=5)
    assert b.shape == (5, 4) and s.shape == (5,) and v.shape == (5,)
    # box 1 suppressed by box 0; padded row (score 0 for class 0) excluded
    assert int(v.sum()) == 2
    np.testing.assert_allclose(np.asarray(s[:2]), [0.9, 0.7], atol=1e-6)


def test_max_iou_assign_semantics():
    anchors = jnp.array([
        [0, 0, 10, 10],     # iou 1.0 with gt0
        [0, 0, 9, 10],      # high iou with gt0
        [100, 100, 110, 110],   # no overlap -> negative
        [18, 18, 32, 32],   # moderate overlap with gt1
    ], jnp.float32)
    gts = jnp.array([[0, 0, 10, 10], [20, 20, 30, 30], [0, 0, 0, 0]],
                    jnp.float32)
    gt_valid = jnp.array([True, True, False])
    assigned, max_ov = max_iou_assign(anchors, gts, gt_valid,
                                      pos_iou_thr=0.7, neg_iou_thr=0.3,
                                      min_pos_iou=0.3)
    a = np.asarray(assigned)
    assert a[0] == 1        # strong positive
    assert a[1] == 1        # 0.9 iou > 0.7
    assert a[2] == 0        # negative
    # anchor 3: iou(18..32 vs 20..30) = 100/ (196+100-100)=0.51 -> between
    # thresholds -> ignore(-1) unless it is gt1's best anchor (it is):
    assert a[3] == 2        # low-quality match claims it
    # padded gt never matched
    assert not np.any(a == 3)


def test_max_iou_assign_no_gt():
    anchors = jnp.array([[0, 0, 10, 10]], jnp.float32)
    gts = jnp.zeros((2, 4), jnp.float32)
    assigned, _ = max_iou_assign(anchors, gts, jnp.zeros(2, bool),
                                 pos_iou_thr=0.7, neg_iou_thr=0.3)
    assert int(assigned[0]) == 0   # all negative when no gt


def test_random_sampler_static_shapes_and_caps():
    rng = jax.random.PRNGKey(0)
    n = 1000
    assigned = jnp.zeros(n, jnp.int32)
    # 700 positives available, cap at 256 of 512
    assigned = assigned.at[:700].set(1)
    res = random_sample(rng, assigned, num=512, pos_fraction=0.5)
    assert res["inds"].shape == (512,)
    assert int(res["is_pos"].sum()) == 256
    assert int(res["valid"].sum()) == 512
    # few positives -> negatives fill
    assigned2 = jnp.zeros(n, jnp.int32).at[:5].set(2)
    res2 = random_sample(rng, assigned2, num=512, pos_fraction=0.5)
    assert int(res2["is_pos"].sum()) == 5
    assert int(res2["valid"].sum()) == 512
    # sampled positives really point at positives
    pos_inds = np.asarray(res2["inds"])[np.asarray(res2["is_pos"])]
    assert np.all(pos_inds < 5)
    assert np.all(np.asarray(res2["pos_gt_inds"])[np.asarray(res2["is_pos"])] == 1)


def test_random_sampler_jit_and_vmap():
    rngs = jax.random.split(jax.random.PRNGKey(1), 4)
    assigned = jnp.tile(jnp.arange(100)[None, :] % 3 - 1, (4, 1)).astype(jnp.int32)
    fn = jax.jit(jax.vmap(lambda r, a: random_sample(r, a, 32, 0.25)))
    out = fn(rngs, assigned)
    assert out["inds"].shape == (4, 32)


def test_legacy_anchor_generator_exact():
    """Exact values from the reference docstring
    (``anchor_generator.py:511-520``): LegacyAnchorGenerator([16], [1.],
    [1.], [9], center_offset=0.5) on a 2x2 grid."""
    from bonai_tpu.core.anchors import LegacyAnchorGenerator
    gen = LegacyAnchorGenerator(strides=[16], ratios=[1.0], scales=[1.0],
                                base_sizes=[9], center_offset=0.5)
    anchors = gen.grid_anchors([(2, 2)])[0]
    np.testing.assert_allclose(
        anchors,
        [[0., 0., 8., 8.], [16., 0., 24., 8.],
         [0., 16., 8., 24.], [16., 16., 24., 24.]])


def test_legacy_delta_coder_roundtrip():
    """legacy encode/decode invert each other and differ from v2 by the
    +1 size convention (reference legacy_delta_xywh_bbox_coder.py)."""
    import jax.numpy as jnp
    from bonai_tpu.core.boxes import bbox2delta, delta2bbox
    props = jnp.asarray([[0., 0., 10., 10.], [5., 5., 40., 30.]])
    gts = jnp.asarray([[2., 1., 12., 8.], [4., 6., 38., 32.]])
    deltas = bbox2delta(props, gts, legacy=True)
    back = delta2bbox(props, deltas, legacy=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gts),
                               atol=1e-4)
    # v2 deltas differ (the +1 convention changes pw/ph)
    d2 = bbox2delta(props, gts, legacy=False)
    assert float(jnp.abs(deltas - d2).max()) > 1e-3
