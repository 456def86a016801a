import numpy as np
import pytest

from bonai_tpu.datasets import mask_utils
from bonai_tpu.evaluation.bonai_eval import (
    masks_to_polygons, poly_iou, poly_area, polygon_f1,
    offset_error_vector, results_to_csv_records, merge_crop_records,
    poly_to_wkt, wkt_to_poly, dump_csv, load_csv)
from bonai_tpu.evaluation.coco_eval import coco_ap, _bbox_iou_np


def sq(x, y, s):
    return np.array([[x, y], [x + s, y], [x + s, y + s], [x, y + s]],
                    np.float32)


def test_poly_iou_exact():
    a = sq(0, 0, 10)
    b = sq(5, 0, 10)
    assert abs(poly_iou(a, b) - 50 / 150) < 0.05
    assert poly_iou(a, sq(100, 100, 5)) == 0.0
    assert poly_iou(a, a) > 0.95


def test_masks_to_polygons():
    mask = np.zeros((64, 64), np.uint8)
    mask[10:30, 12:40] = 1
    polys = masks_to_polygons(mask)
    assert len(polys) == 1
    assert abs(poly_area(polys[0]) - 20 * 28) / (20 * 28) < 0.15


def test_polygon_f1_and_offset_error():
    gt = {"img1": [dict(polygon=sq(0, 0, 20), footprint_polygon=sq(2, 3, 20),
                        score=1.0, offset=np.array([-2., -3.])),
                   dict(polygon=sq(50, 50, 20),
                        footprint_polygon=sq(50, 50, 20),
                        score=1.0, offset=np.array([0., 0.]))]}
    pred = {"img1": [dict(polygon=sq(1, 0, 20), footprint_polygon=sq(3, 3, 20),
                          score=0.9, offset=np.array([-2., -3.])),
                     dict(polygon=sq(200, 200, 10),
                          footprint_polygon=sq(200, 200, 10),
                          score=0.8, offset=np.array([5., 5.]))]}
    metrics, matches = polygon_f1(pred, gt)
    assert metrics["tp"] == 1 and metrics["fp"] == 1 and metrics["fn"] == 1
    assert abs(metrics["f1"] - 0.5) < 1e-6
    off = offset_error_vector(pred, gt, matches)
    assert off["matched"] == 1
    assert off["aEPE"] < 1e-6


def test_results_to_records_and_merge():
    mask = np.zeros((64, 64), np.uint8)
    mask[8:40, 8:40] = 1
    rle = mask_utils.encode_mask(mask)
    bbox = np.array([[8, 8, 40, 40, 0.95]], np.float32)
    res = ([bbox], [[rle]], np.array([[4.0, -6.0]], np.float32))
    recs = results_to_csv_records([res], ["city__1024_2048.png"],
                                  score_thr=0.4, min_area=100)
    r = recs["city__1024_2048.png"][0]
    np.testing.assert_allclose(r["footprint_polygon"],
                               r["polygon"] - np.array([4.0, -6.0]),
                               atol=1e-5)
    merged = merge_crop_records(recs)
    assert "city" in merged
    np.testing.assert_allclose(
        merged["city"][0]["polygon"],
        r["polygon"] + np.array([1024.0, 2048.0]), atol=1e-5)


def test_score_and_area_filters():
    mask = np.zeros((32, 32), np.uint8)
    mask[0:5, 0:5] = 1     # tiny
    rle = mask_utils.encode_mask(mask)
    res = ([np.array([[0, 0, 5, 5, 0.9], [0, 0, 5, 5, 0.1]], np.float32)],
           [[rle, rle]], np.zeros((2, 2), np.float32))
    recs = results_to_csv_records([res], ["a.png"], score_thr=0.4,
                                  min_area=500)
    assert recs["a.png"] == []


def test_wkt_roundtrip(tmp_path):
    p = sq(1.5, 2.5, 10)
    q = wkt_to_poly(poly_to_wkt(p))
    np.testing.assert_allclose(p, q, atol=0.01)
    recs = {"img": [dict(polygon=p, footprint_polygon=p, score=0.7,
                         offset=np.zeros(2))]}
    path = str(tmp_path / "t.csv")
    dump_csv(recs, path)
    back = load_csv(path)
    np.testing.assert_allclose(back["img"][0]["polygon"], p, atol=0.01)


def test_coco_ap_perfect_and_half():
    # one image, 2 gts, 2 perfect detections
    per_image = [dict(scores=np.array([0.9, 0.8]),
                      ious=np.eye(2), gt_ignore=np.zeros(2, bool))]
    stats = coco_ap(per_image)
    assert stats["ap"] > 0.99
    # one tp (iou 1.0) + one fp scored higher
    per_image = [dict(scores=np.array([0.95, 0.9]),
                      ious=np.array([[0.0, 0.0], [1.0, 0.0]]),
                      gt_ignore=np.zeros(2, bool))]
    stats = coco_ap(per_image)
    assert 0.2 < stats["ap50"] < 0.3   # recall caps at 0.5, precision 0.5


def test_coco_ap_iou_threshold_sensitivity():
    # det iou 0.6: counts at thr .5/.55/.6 but not above
    per_image = [dict(scores=np.array([0.9]),
                      ious=np.array([[0.6]]),
                      gt_ignore=np.zeros(1, bool))]
    stats = coco_ap(per_image)
    assert stats["ap50"] > 0.99
    assert stats["ap75"] == 0.0
    assert abs(stats["ap"] - 3 / 10) < 0.01


def test_bbox_iou_np():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15]], np.float32)
    iou = _bbox_iou_np(a, b)
    assert abs(iou[0, 0] - 1.0) < 1e-6
    assert abs(iou[0, 1] - 25 / 175) < 1e-6


def test_coco_pr_curve_perfect_and_miss():
    from bonai_tpu.evaluation.coco_eval import coco_pr_curve
    # one image, 2 gts, 2 perfect dets + 1 low-score FP
    rec = dict(scores=np.asarray([0.9, 0.8, 0.1]),
               ious=np.asarray([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]]),
               gt_ignore=np.zeros(2, bool))
    rs, q = coco_pr_curve([rec], 0.5)
    # both gts matched before the FP -> precision 1 at every recall point
    assert q[0] == 1.0 and q[50] == 1.0 and q[100] == 1.0
    # at IoU 0.75 with the same records everything still matches (IoU 1.0)
    _, q75 = coco_pr_curve([rec], 0.75)
    assert q75[100] == 1.0
    # drop one gt's match: recall saturates at 0.5, envelope 0 past it
    rec2 = dict(scores=np.asarray([0.9, 0.8]),
                ious=np.asarray([[1.0, 0.0], [0.0, 0.4]]),
                gt_ignore=np.zeros(2, bool))
    _, qh = coco_pr_curve([rec2], 0.5)
    assert qh[50] == 1.0 and qh[51] == 0.0


def test_error_analysis_tool(tmp_path):
    import sys as _sys
    import os.path as _osp
    _sys.path.insert(0, _osp.join(_osp.dirname(_osp.dirname(
        _osp.abspath(__file__))), "tools"))
    from coco_error_analysis_f1 import analyze, compute_curves
    from helpers import make_bonai_dataset
    from bonai_tpu.datasets import build_dataset
    jp, imgd = make_bonai_dataset(str(tmp_path), num_images=2, size=128,
                                  buildings_per_img=3)
    ds = build_dataset(dict(type="BONAI", ann_file=jp, img_prefix=imgd,
                            test_mode=True, bbox_type="building",
                            mask_type="roof",
                            pipeline=[dict(type="LoadImageFromFile"),
                                      dict(type="Collect", keys=["img"])]))
    # perfect detections: the gt building boxes with score 0.9
    results = []
    for i in range(2):
        ann = ds.get_ann_info(i)
        dets = np.concatenate([ann["bboxes"],
                               np.full((len(ann["bboxes"]), 1), 0.9)], 1)
        results.append(([dets.astype(np.float32)],))
    rs, ps = compute_curves(ds, results, 0, "bbox")
    assert ps.shape == (7, 101)
    # perfect dets -> C50 curve is 1 up to recall 1
    assert ps[1, 100] == 1.0
    # curves are stacked monotone: C75 <= C50 <= ... <= FN
    assert (np.diff(ps, axis=0) >= -1e-9).all()
    out = analyze(results, ds, str(tmp_path / "out"), ("bbox",))
    assert (tmp_path / "out" / "bbox" / "maxF1score.txt").exists()
    assert (tmp_path / "out" / "bbox" / "bbox-building-F1.png").exists()
