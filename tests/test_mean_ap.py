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
