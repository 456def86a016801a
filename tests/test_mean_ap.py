import numpy as np

from bonai_tpu.evaluation.mean_ap import (eval_map, eval_recalls,
                                          average_precision)


def test_average_precision_perfect():
    r = np.array([0.5, 1.0])
    p = np.array([1.0, 1.0])
    assert abs(average_precision(r, p) - 1.0) < 1e-6


def test_eval_map_simple():
    gts = [dict(bboxes=np.array([[0, 0, 10, 10], [20, 20, 30, 30]],
                                np.float32),
                labels=np.array([0, 0]))]
    dets = [[np.array([[0, 0, 10, 10, 0.9],
                       [20, 20, 30, 30, 0.8],
                       [50, 50, 60, 60, 0.7]], np.float32)]]
    mAP, per_cls = eval_map(dets, gts)
    assert per_cls[0]["num_gts"] == 2
    assert abs(per_cls[0]["recall"] - 1.0) < 1e-6
    assert 0.9 < mAP <= 1.0


def test_eval_map_miss():
    gts = [dict(bboxes=np.array([[0, 0, 10, 10]], np.float32),
                labels=np.array([0]))]
    dets = [[np.array([[50, 50, 60, 60, 0.9]], np.float32)]]
    mAP, per_cls = eval_map(dets, gts)
    assert mAP == 0.0


def test_eval_recalls():
    gts = [np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)]
    props = [np.array([[0, 0, 10, 10, 0.9], [100, 100, 110, 110, 0.8]],
                      np.float32)]
    rec = eval_recalls(gts, props, proposal_nums=(1, 2), iou_thrs=(0.5,))
    assert abs(rec[0, 0] - 0.5) < 1e-6    # top-1 proposal hits 1 of 2 gts
    assert abs(rec[1, 0] - 0.5) < 1e-6


def test_dataset_evaluate_integration(tmp_path):
    import sys
    import os.path as osp
    sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
    from helpers import make_bonai_dataset, TRAIN_PIPELINE
    from bonai_tpu.datasets import BONAI
    json_path, img_dir = make_bonai_dataset(str(tmp_path), num_images=2)
    ds = BONAI(ann_file=json_path, pipeline=TRAIN_PIPELINE,
               img_prefix=img_dir, bbox_type="building", mask_type="roof")
    # perfect detections == gt boxes
    results = []
    for i in range(len(ds)):
        ann = ds.get_ann_info(i)
        dets = np.concatenate(
            [ann["bboxes"], np.full((len(ann["bboxes"]), 1), 0.99,
                                    np.float32)], axis=1)
        results.append([dets])
    out = ds.evaluate(results, metric=["bbox", "mAP", "recall"])
    assert out["bbox_mAP_50"] > 0.99
    assert out["mAP"] > 0.99
    assert out["AR@100"] == 1.0


def test_eval_map_scale_ranges_and_ignore():
    """Hand-computed AP over area ranges + crowd-ignore semantics
    (reference mean_ap.py:267-392; VERDICT r3 #10)."""
    import numpy as np
    from bonai_tpu.evaluation.mean_ap import eval_map

    # one image, one class: a small gt (8x8=64 area) and a large gt
    # (40x40=1600); an ignore region at (100..110)
    ann = dict(
        bboxes=np.array([[0., 0., 8., 8.], [50., 50., 90., 90.]],
                        np.float32),
        labels=np.zeros(2, np.int64),
        bboxes_ignore=np.array([[100., 100., 110., 110.]], np.float32))
    dets = [np.array([
        [0., 0., 8., 8., 0.9],          # TP small
        [50., 50., 90., 90., 0.8],      # TP large
        [100., 100., 110., 110., 0.7],  # matches ignore -> neither
        [200., 200., 208., 208., 0.6],  # FP small
    ], np.float32)]

    mean_ap, res = eval_map([dets], [ann], iou_thr=0.5)
    # full range: 2 TP, 1 FP (the ignore match does not count)
    assert res[0]["num_gts"] == 2
    # P/R curve: [1/1, 2/2, 2/3] -> AP = 1.0
    assert abs(mean_ap - 1.0) < 1e-6

    # two scale ranges: small (0..32), large (32..1e5)
    mean_ap_s, res_s = eval_map(
        [dets], [ann], iou_thr=0.5,
        scale_ranges=[(0, 32), (32, 100000)])
    assert isinstance(mean_ap_s, list) and len(mean_ap_s) == 2
    assert list(res_s[0]["num_gts"]) == [1, 1]
    # small range: TP@0.9 then FP@0.6 -> AP 1.0 (recall hits 1 at rank 1)
    assert abs(mean_ap_s[0] - 1.0) < 1e-6
    # large range: single TP, no FP in range -> AP 1.0
    assert abs(mean_ap_s[1] - 1.0) < 1e-6

    # drop the small TP: small-range AP collapses, large unaffected
    dets2 = [dets[0][1:]]
    mean_ap_s2, _ = eval_map([dets2], [ann], iou_thr=0.5,
                             scale_ranges=[(0, 32), (32, 100000)])
    assert mean_ap_s2[0] < 0.6 and abs(mean_ap_s2[1] - 1.0) < 1e-6


def test_eval_map_duplicate_det_is_fp():
    """Second det on an already-covered gt is a FP (reference
    tpfp_default covered-gt branch)."""
    import numpy as np
    from bonai_tpu.evaluation.mean_ap import eval_map
    ann = dict(bboxes=np.array([[0., 0., 10., 10.]], np.float32),
               labels=np.zeros(1, np.int64))
    dets = [np.array([[0., 0., 10., 10., 0.9],
                      [0., 0., 10., 10., 0.8]], np.float32)]
    mean_ap, res = eval_map([dets], [ann])
    # P/R: [1/1, 1/2] -> AP = 1.0 (area mode; recall 1 reached at P=1)
    assert abs(mean_ap - 1.0) < 1e-6
    assert res[0]["num_dets"] == 2


def test_print_map_summary_table(capsys):
    import numpy as np
    from bonai_tpu.evaluation.mean_ap import eval_map
    ann = dict(bboxes=np.array([[0., 0., 10., 10.]], np.float32),
               labels=np.zeros(1, np.int64))
    dets = [np.array([[0., 0., 10., 10., 0.9]], np.float32)]
    eval_map([dets], [ann], dataset=["building"], logger="print")
    out = capsys.readouterr().out
    assert "building" in out and "mAP" in out
