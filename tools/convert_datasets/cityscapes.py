#!/usr/bin/env python
"""Convert Cityscapes gtFine annotations to COCO-style instance jsons.

reference: ``tools/convert_datasets/cityscapes.py`` (cityscapesscripts +
pycocotools there; stdlib + the in-repo RLE codec here).  Reads
``*_gtFine_instanceIds.png`` maps: pixel values >= 24 are instance
classes, values >= 1000 encode ``label_id * 1000 + instance`` (crowd
regions keep the bare label id).  Only the 8 instance-evaluated classes
are emitted, matching ``CityscapesDataset.CLASSES``.

Usage:
  python tools/convert_datasets/cityscapes.py CITYSCAPES_DIR OUT_DIR
    CITYSCAPES_DIR: root with leftImg8bit/{split} and gtFine/{split}
    OUT_DIR: where instancesonly_filtered_gtFine_{split}.json are written
"""

import glob
import json
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from bonai_tpu.datasets.mask_utils import encode_mask  # noqa: E402

# cityscapesscripts label ids for the 8 instance classes (reference
# CityscapesDataset.CLASSES order)
INSTANCE_LABELS = {
    24: "person", 25: "rider", 26: "car", 27: "truck", 28: "bus",
    31: "train", 32: "motorcycle", 33: "bicycle",
}


def mask_bbox(mask):
    ys, xs = np.nonzero(mask)
    if not len(xs):
        return None
    x1, x2 = xs.min(), xs.max() + 1
    y1, y2 = ys.min(), ys.max() + 1
    return [float(x1), float(y1), float(x2 - x1), float(y2 - y1)]


def convert_split(cs_dir, split, out_json):
    import cv2
    img_dir = osp.join(cs_dir, "leftImg8bit", split)
    gt_dir = osp.join(cs_dir, "gtFine", split)
    suffix = "leftImg8bit.png"
    img_files = sorted(glob.glob(osp.join(img_dir, "**", "*.png"),
                                 recursive=True))
    categories = [dict(id=lid, name=name)
                  for lid, name in sorted(INSTANCE_LABELS.items())]
    images, annotations = [], []
    ann_id = 1
    for img_idx, img_file in enumerate(img_files, 1):
        rel = osp.relpath(img_file, img_dir)
        inst_file = osp.join(gt_dir, rel[:-len(suffix)]
                             + "gtFine_instanceIds.png")
        inst_img = cv2.imread(inst_file, cv2.IMREAD_UNCHANGED)
        if inst_img is None:
            print(f"skipping {rel}: no instance map at {inst_file}")
            continue
        h, w = inst_img.shape[:2]
        images.append(dict(id=img_idx, file_name=rel, width=int(w),
                           height=int(h),
                           segm_file=osp.join(
                               osp.dirname(rel),
                               osp.basename(inst_file).replace(
                                   "instanceIds", "labelIds"))))
        for inst_id in np.unique(inst_img[inst_img >= 24]):
            label_id = int(inst_id) // 1000 if inst_id >= 1000 \
                else int(inst_id)
            if label_id not in INSTANCE_LABELS:
                continue
            mask = (inst_img == inst_id).astype(np.uint8)
            bbox = mask_bbox(mask)
            if bbox is None:
                continue
            rle = encode_mask(mask)
            annotations.append(dict(
                id=ann_id, image_id=img_idx, category_id=label_id,
                bbox=bbox, area=float(mask.sum()),
                iscrowd=int(inst_id < 1000), segmentation=rle))
            ann_id += 1
    with open(out_json, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=categories), f)
    print(f"{split}: {len(images)} images, {len(annotations)} instances "
          f"-> {out_json}")


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    cs_dir, out_dir = sys.argv[1:3]
    os.makedirs(out_dir, exist_ok=True)
    for split in ("train", "val", "test"):
        if not osp.isdir(osp.join(cs_dir, "leftImg8bit", split)):
            continue
        convert_split(
            cs_dir, split,
            osp.join(out_dir,
                     f"instancesonly_filtered_gtFine_{split}.json"))


if __name__ == "__main__":
    main()
