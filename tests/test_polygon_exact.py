"""Exact polygon-overlay geometry (evaluation/polygon.py) vs the raster
cross-check, plus the reference overlay-matrix F1 semantics
(reference bonai_evaluation.py:403-501)."""

import numpy as np
import pytest

from bonai_tpu.evaluation.polygon import (
    PreparedPolygon, triangulate, polygon_area, intersection_area,
    poly_iou_exact)
from bonai_tpu.evaluation.bonai_eval import poly_iou, polygon_f1


def sq(x, y, s):
    return np.array([[x, y], [x + s, y], [x + s, y + s], [x, y + s]],
                    np.float64)


def lshape(x=0, y=0, s=10):
    """Non-convex L: s x s square minus its upper-right quadrant."""
    return np.array([[x, y], [x + s, y], [x + s, y + s / 2],
                     [x + s / 2, y + s / 2], [x + s / 2, y + s],
                     [x, y + s]], np.float64)


def star(n, r1, r2, cx=0.0, cy=0.0, seed=None):
    """Star-shaped (hence simple) polygon with alternating radii."""
    rng = np.random.RandomState(seed)
    th = np.sort(rng.uniform(0, 2 * np.pi, 2 * n)) if seed is not None \
        else np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    r = np.where(np.arange(2 * n) % 2 == 0, r1, r2)
    if seed is not None:
        r = rng.uniform(r2, r1, 2 * n)
    return np.stack([cx + r * np.cos(th), cy + r * np.sin(th)], 1)


def test_triangulation_covers_area():
    for poly in (sq(0, 0, 7), lshape(), star(6, 10, 4),
                 star(9, 8, 3, seed=0), star(12, 20, 6, seed=3)):
        tris = triangulate(poly)
        assert tris is not None
        tri_area = sum(polygon_area(t) for t in tris)
        assert tri_area == pytest.approx(polygon_area(poly), rel=1e-9)


def test_triangulation_orientation_invariant():
    p = lshape()
    a = sum(polygon_area(t) for t in triangulate(p))
    b = sum(polygon_area(t) for t in triangulate(p[::-1]))
    assert a == pytest.approx(b, rel=1e-12)


def test_exact_intersection_squares():
    # analytic: [5,10]x[0,10] overlap = 50
    A, B = PreparedPolygon(sq(0, 0, 10)), PreparedPolygon(sq(5, 0, 10))
    assert intersection_area(A, B) == pytest.approx(50.0, rel=1e-9)
    assert poly_iou_exact(sq(0, 0, 10), sq(5, 0, 10)) == \
        pytest.approx(50 / 150, rel=1e-9)
    # disjoint and identical
    assert poly_iou_exact(sq(0, 0, 10), sq(30, 30, 5)) == 0.0
    assert poly_iou_exact(sq(0, 0, 10), sq(0, 0, 10)) == \
        pytest.approx(1.0, rel=1e-9)


def test_exact_intersection_nonconvex():
    # L-shape vs the square covering it: intersection = L area exactly
    L = lshape(0, 0, 10)
    S = sq(0, 0, 10)
    inter = intersection_area(PreparedPolygon(L), PreparedPolygon(S))
    assert inter == pytest.approx(polygon_area(L), rel=1e-9)
    # L vs the quadrant that was cut out: zero overlap (shared edge only)
    Q = sq(5, 5, 5)
    inter = intersection_area(PreparedPolygon(L), PreparedPolygon(Q))
    assert inter == pytest.approx(0.0, abs=1e-9)


def test_exact_matches_raster_supersampled():
    """The raster IoU must converge to the exact value as supersampling
    grows — validates both paths against each other."""
    rng_cases = [
        (star(8, 30, 12, 40, 40, seed=1), star(8, 28, 14, 50, 45, seed=2)),
        (lshape(10, 10, 40), sq(20, 20, 35)),
        (star(5, 25, 10, 30, 30, seed=4), sq(15, 15, 30)),
    ]
    for pa, pb in rng_cases:
        exact = poly_iou_exact(pa, pb)
        coarse = poly_iou(pa, pb, supersample=1)
        fine = poly_iou(pa, pb, supersample=8)
        assert abs(fine - exact) < abs(coarse - exact) + 0.02
        assert fine == pytest.approx(exact, abs=0.03)


def test_near_half_iou_decision_is_stable():
    """A pair engineered near IoU 0.5: the exact path gives the same
    TP/FP decision regardless of raster resolution (the round-2 raster
    evaluator could flip it)."""
    # two 10x10 squares overlapping by 10x w: IoU = 10w/(200-10w)
    # w = 20/3 -> IoU exactly 0.5
    w = 20 / 3
    a = sq(0, 0, 10)
    b = sq(10 - w, 0, 10)
    assert poly_iou_exact(a, b) == pytest.approx(0.5, abs=1e-12)
    # slightly under / over
    under = sq(10 - w + 1e-3, 0, 10)
    over = sq(10 - w - 1e-3, 0, 10)
    assert poly_iou_exact(a, under) < 0.5 < poly_iou_exact(a, over)


def test_degenerate_polygons():
    line = np.array([[0, 0], [10, 0], [20, 0]], np.float64)
    assert triangulate(line) is None or \
        sum(polygon_area(t) for t in triangulate(line)) < 1e-9
    tiny = np.array([[0, 0], [1, 0]], np.float64)
    assert triangulate(tiny) is None
    # duplicate-vertex polygon still triangulates to the right area
    dup = np.array([[0, 0], [0, 0], [10, 0], [10, 10], [10, 10], [0, 10]],
                   np.float64)
    assert sum(polygon_area(t) for t in triangulate(dup)) == \
        pytest.approx(100.0, rel=1e-9)


def test_f1_reference_overlay_semantics():
    """TP counts every >=thr pair from the overlay matrix (not greedy
    one-to-one), and empty-side images are skipped entirely."""
    gt = {
        "a": [dict(polygon=sq(0, 0, 20), score=1.0),
              dict(polygon=sq(100, 100, 20), score=1.0)],
        "empty_pred": [dict(polygon=sq(0, 0, 20), score=1.0)],
    }
    pred = {
        "a": [dict(polygon=sq(1, 0, 20), score=0.9),
              dict(polygon=sq(99, 100, 20), score=0.8)],
        "only_pred": [dict(polygon=sq(0, 0, 20), score=0.9)],
    }
    m, matches = polygon_f1(pred, gt, iou_thr=0.5)
    # 'empty_pred' (no preds) and 'only_pred' (not in GT list) are skipped
    assert m["tp"] == 2 and m["fp"] == 0 and m["fn"] == 0
    assert set(matches) == {"a"}
    # skip_empty=False: conventional accounting counts them
    m2, _ = polygon_f1(pred, gt, iou_thr=0.5, skip_empty=False)
    assert m2["tp"] == 2 and m2["fp"] == 1 and m2["fn"] == 1


def test_f1_regularized_iou_small_polygons():
    """The +1.0 regulariser (reference bonai_evaluation.py:467) pushes
    tiny-polygon pairs below threshold even at perfect overlap."""
    tiny = sq(0, 0, 1.2)   # area 1.44; reg-IoU = 1.44/(1.44+1) = 0.59
    tinier = sq(0, 0, 0.9)  # area 0.81; reg-IoU = 0.81/1.81 = 0.45 < 0.5
    gt = {"a": [dict(polygon=tiny, score=1.0)],
          "b": [dict(polygon=tinier, score=1.0)]}
    pred = {"a": [dict(polygon=tiny, score=0.9)],
            "b": [dict(polygon=tinier, score=0.9)]}
    m, _ = polygon_f1(pred, gt, iou_thr=0.5)
    assert m["tp"] == 1 and m["fp"] == 1 and m["fn"] == 1
