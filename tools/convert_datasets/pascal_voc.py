#!/usr/bin/env python
"""Convert PASCAL VOC XML annotations to a COCO-style json.

reference: ``tools/convert_datasets/pascal_voc.py`` (XML -> middle-format
pkl); here the target is the in-repo COCO json surface so the converted
set loads through ``CocoDataset`` directly.

Usage: python tools/convert_datasets/pascal_voc.py VOCDIR SPLIT OUT.json
  VOCDIR: e.g. data/VOCdevkit/VOC2007
  SPLIT:  e.g. trainval (reads ImageSets/Main/trainval.txt, falls back
          to a bare id list file path)
"""

import json
import os.path as osp
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from bonai_tpu.datasets.extra import VOCDataset  # noqa: E402


def main():
    if len(sys.argv) != 4:
        print(__doc__)
        sys.exit(1)
    voc_dir, split, out_json = sys.argv[1:4]
    split_file = osp.join(voc_dir, "ImageSets", "Main", f"{split}.txt")
    if not osp.isfile(split_file):
        split_file = split
    with open(split_file) as f:
        ids = [ln.strip() for ln in f if ln.strip()]

    categories = [dict(id=i + 1, name=c)
                  for i, c in enumerate(VOCDataset.CLASSES)]
    name2id = {c["name"]: c["id"] for c in categories}
    images, annotations = [], []
    ann_id = 1
    for img_idx, img_id in enumerate(ids, 1):
        xml_path = osp.join(voc_dir, "Annotations", f"{img_id}.xml")
        width = height = 0
        objs = []
        if osp.isfile(xml_path):
            root = ET.parse(xml_path).getroot()
            size = root.find("size")
            if size is not None:
                width = int(size.find("width").text)
                height = int(size.find("height").text)
            objs = root.findall("object")
        images.append(dict(id=img_idx, width=width, height=height,
                           file_name=f"JPEGImages/{img_id}.jpg"))
        for obj in objs:
            name = obj.find("name").text
            if name not in name2id:
                continue
            bb = obj.find("bndbox")
            x1 = float(bb.find("xmin").text) - 1
            y1 = float(bb.find("ymin").text) - 1
            x2 = float(bb.find("xmax").text)
            y2 = float(bb.find("ymax").text)
            difficult = obj.find("difficult")
            annotations.append(dict(
                id=ann_id, image_id=img_idx,
                category_id=name2id[name],
                bbox=[x1, y1, x2 - x1, y2 - y1],
                area=(x2 - x1) * (y2 - y1),
                iscrowd=int(difficult.text) if difficult is not None
                else 0))
            ann_id += 1
    with open(out_json, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=categories), f)
    print(f"wrote {out_json}: {len(images)} images, "
          f"{len(annotations)} annotations")


if __name__ == "__main__":
    main()
