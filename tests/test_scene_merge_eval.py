"""End-to-end crop->scene merged evaluation on true originals.

The generator (tools/make_synthetic_bonai.py write_scene_split) produces
2048^2 scene originals plus their 1024^2 crops named ``scene____x_y``;
buildings spanning a crop boundary are clipped in the crop json but whole
in the originals json.  Feeding the crop GT back as "predictions" through
merge_crop_records and scoring against the scene GT exercises the exact
protocol the reference uses for merged CSVs
(reference tools/bonai/bonai_evaluation.py:104-112).
"""

import json
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.fixture(scope="module")
def scene_ds(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scene_ds"))
    env = dict(JAX_PLATFORMS="cpu")
    import os
    env = {**os.environ, **env}
    subprocess.run(
        [sys.executable, osp.join(REPO, "tools", "make_synthetic_bonai.py"),
         "--out", out, "--train", "0", "--val-scenes", "2", "--seed", "3"],
        check=True, env=env)
    return out


def _records_from_json(path):
    sys.path.insert(0, REPO)
    from tools.bonai.bonai_evaluation import gt_records_from_json
    return gt_records_from_json(path, min_area=500)


def test_crop_naming_and_clipping(scene_ds):
    crop = json.load(open(osp.join(scene_ds, "val", "val.json")))
    orig = json.load(open(osp.join(
        scene_ds, "val_originals", "val_originals.json")))
    assert len(crop["images"]) == 4 * len(orig["images"])
    for im in crop["images"]:
        stem = im["file_name"].rsplit(".", 1)[0]
        base, xy = stem.split("__")
        x, y = map(int, xy.split("_"))
        assert base.startswith("scene") and x in (0, 1024) and y in (0, 1024)
    # crop anns are clipped into the 1024 window
    for a in crop["annotations"]:
        x, y, w, h = a["bbox"]
        assert x >= -1 and y >= -1 and x + w <= 1025 and y + h <= 1025
    # boundary buildings appear in >= as many crop anns as scene anns
    assert len(crop["annotations"]) >= len(orig["annotations"]) - 2


def test_merged_f1_against_originals(scene_ds):
    sys.path.insert(0, REPO)
    from bonai_tpu.evaluation.bonai_eval import (merge_crop_records,
                                                 polygon_f1)
    pred = _records_from_json(osp.join(scene_ds, "val", "val.json"))
    gt = _records_from_json(osp.join(
        scene_ds, "val_originals", "val_originals.json"))
    merged = merge_crop_records(pred)
    gt = {k.rsplit(".", 1)[0]: v for k, v in gt.items()}
    assert set(merged) == set(gt)
    metrics, _ = polygon_f1(merged, gt, iou_thr=0.5, key="polygon")
    # interior buildings merge back exactly; only boundary-clipped
    # instances can miss the 0.5 IoU bar (two halves vs one whole)
    assert metrics["recall"] > 0.85, metrics
    assert metrics["f1"] > 0.8, metrics
    # and at a loose IoU the merge must be near-perfect
    loose, _ = polygon_f1(merged, gt, iou_thr=0.2, key="polygon")
    assert loose["recall"] > 0.97, loose
