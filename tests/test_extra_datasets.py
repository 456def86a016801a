"""VOC/XML, LVIS, Cityscapes, WIDER dataset shims (reference
``mmdet/datasets/{xml_style,voc,lvis,cityscapes,wider_face}.py``)."""

import os
import os.path as osp

import numpy as np

from bonai_tpu.datasets.builder import build_dataset


def _make_voc(root, n=3):
    os.makedirs(osp.join(root, "Annotations"), exist_ok=True)
    os.makedirs(osp.join(root, "JPEGImages"), exist_ok=True)
    ids = []
    for i in range(n):
        img_id = f"img{i:03d}"
        ids.append(img_id)
        import cv2
        cv2.imwrite(osp.join(root, "JPEGImages", f"{img_id}.jpg"),
                    np.random.randint(0, 255, (64, 80, 3), np.uint8))
        xml = f"""<annotation>
  <size><width>80</width><height>64</height><depth>3</depth></size>
  <object><name>dog</name><difficult>0</difficult>
    <bndbox><xmin>11</xmin><ymin>6</ymin><xmax>41</xmax><ymax>30</ymax></bndbox>
  </object>
  <object><name>cat</name><difficult>0</difficult>
    <bndbox><xmin>31</xmin><ymin>21</ymin><xmax>71</xmax><ymax>56</ymax></bndbox>
  </object>
  <object><name>unicorn</name><difficult>0</difficult>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>9</xmax><ymax>9</ymax></bndbox>
  </object>
</annotation>"""
        with open(osp.join(root, "Annotations", f"{img_id}.xml"), "w") as f:
            f.write(xml)
    split = osp.join(root, "trainval.txt")
    with open(split, "w") as f:
        f.write("\n".join(ids))
    return split


def test_voc_dataset_parse_and_map(tmp_path):
    root = str(tmp_path / "VOC2007")
    split = _make_voc(root)
    ds = build_dataset(dict(
        type="VOCDataset", ann_file=split, img_prefix=root,
        pipeline=[dict(type="LoadImageFromFile"),
                  dict(type="LoadAnnotations", with_bbox=True)]))
    assert len(ds) == 3
    assert ds.year == 2007
    ann = ds.get_ann_info(0)
    # 'unicorn' is not a VOC class; 1-based xml coords become 0-based
    assert ann["bboxes"].shape == (2, 4)
    assert ann["bboxes"][0, 0] == 10.0
    names = [ds.CLASSES[l] for l in ann["labels"]]
    assert names == ["dog", "cat"]

    # perfect detections -> mAP 1.0
    results = []
    for i in range(len(ds)):
        a = ds.get_ann_info(i)
        per_class = [np.zeros((0, 5), np.float32)
                     for _ in range(len(ds.CLASSES))]
        for box, lab in zip(a["bboxes"], a["labels"]):
            det = np.concatenate([box, [0.9]]).astype(np.float32)
            per_class[lab] = np.vstack([per_class[lab], det[None]])
        results.append(per_class)
    out = ds.evaluate(results)
    assert abs(out["mAP"] - 1.0) < 1e-6


def test_wider_and_registry():
    from bonai_tpu.datasets.extra import (CityscapesDataset, LVISDataset,
                                          WIDERFaceDataset)
    assert WIDERFaceDataset.CLASSES == ("face",)
    assert len(CityscapesDataset.CLASSES) == 8
    assert issubclass(LVISDataset, object)


def test_pascal_voc_converter(tmp_path):
    """tools/convert_datasets/pascal_voc.py -> CocoDataset roundtrip."""
    import subprocess
    import sys
    root = str(tmp_path / "VOC2007")
    split = _make_voc(root)
    out = str(tmp_path / "voc.json")
    r = subprocess.run(
        [sys.executable, "tools/convert_datasets/pascal_voc.py",
         root, split, out], capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    ds = build_dataset(dict(
        type="CocoDataset", ann_file=out, img_prefix=root,
        pipeline=[dict(type="LoadImageFromFile"),
                  dict(type="LoadAnnotations", with_bbox=True)]))
    assert len(ds) == 3
    ann = ds.get_ann_info(0)
    assert ann["bboxes"].shape == (2, 4)       # unicorn dropped
    assert ds.CLASSES[ann["labels"][0]] == "dog"
