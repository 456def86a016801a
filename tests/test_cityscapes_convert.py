"""Cityscapes->COCO converter roundtrip (VERDICT r3 #8).

Builds a tiny synthetic gtFine tree, converts it, and loads the result
through CityscapesDataset (reference
``tools/convert_datasets/cityscapes.py`` semantics: instanceIds >= 1000
encode label*1000+i, bare label ids are crowd regions).
"""

import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("cityscapes")
    img_dir = root / "leftImg8bit" / "val" / "frankfurt"
    gt_dir = root / "gtFine" / "val" / "frankfurt"
    os.makedirs(img_dir)
    os.makedirs(gt_dir)
    h, w = 64, 96
    img = np.zeros((h, w, 3), np.uint8)
    cv2.imwrite(str(img_dir / "frankfurt_000000_leftImg8bit.png"), img)
    inst = np.zeros((h, w), np.uint16)
    inst[5:20, 5:25] = 26 * 1000 + 0      # car instance
    inst[30:50, 10:40] = 24 * 1000 + 1    # person instance
    inst[2:6, 60:90] = 26                 # crowd car region
    inst[55:60, 60:70] = 7                # road (stuff) — must be ignored
    cv2.imwrite(str(gt_dir / "frankfurt_000000_gtFine_instanceIds.png"),
                inst)
    out_dir = root / "annotations"
    r = subprocess.run(
        [sys.executable,
         osp.join(REPO, "tools", "convert_datasets", "cityscapes.py"),
         str(root), str(out_dir)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return root, out_dir / "instancesonly_filtered_gtFine_val.json"


def test_convert_contents(converted):
    _, out_json = converted
    coco = json.load(open(out_json))
    assert len(coco["images"]) == 1
    assert coco["images"][0]["file_name"] == \
        "frankfurt/frankfurt_000000_leftImg8bit.png"
    anns = coco["annotations"]
    assert len(anns) == 3                      # 2 instances + 1 crowd
    by_cat = sorted((a["category_id"], a["iscrowd"]) for a in anns)
    assert by_cat == [(24, 0), (26, 0), (26, 1)]
    car = [a for a in anns if a["category_id"] == 26
           and not a["iscrowd"]][0]
    assert car["bbox"] == [5.0, 5.0, 20.0, 15.0]
    assert car["area"] == 20 * 15
    # RLE decodes back to the mask
    from bonai_tpu.datasets.mask_utils import decode_mask
    m = decode_mask(car["segmentation"])
    assert m.sum() == 300 and m[10, 10] == 1


def test_loads_through_dataset(converted):
    root, out_json = converted
    from bonai_tpu.datasets.extra import CityscapesDataset
    ds = CityscapesDataset(
        ann_file=str(out_json),
        img_prefix=str(root / "leftImg8bit" / "val") + "/",
        pipeline=[dict(type="LoadImageFromFile"),
                  dict(type="LoadAnnotations", with_bbox=True,
                       with_mask=True)])
    assert len(ds) == 1
    ann = ds.get_ann_info(0)
    assert ann["bboxes"].shape == (2, 4)       # crowd goes to ignore
    assert ann["bboxes_ignore"].shape[0] == 1
