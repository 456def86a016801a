"""Shared test fixtures: synthetic BONAI-format dataset on disk."""

import json
import os
import os.path as osp

import numpy as np


def make_bonai_dataset(root, num_images=4, size=256, buildings_per_img=6,
                       seed=0):
    """Write a small BONAI-format COCO json + images; returns (json, imgdir).

    Each building is an axis-aligned rectangular roof translated by a known
    offset from its footprint (the geometry the real dataset encodes).
    """
    import cv2
    rng = np.random.RandomState(seed)
    img_dir = osp.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    aid = 1
    for i in range(num_images):
        fname = f"img_{i}.png"
        img = rng.randint(0, 255, (size, size, 3), np.uint8)
        for b in range(buildings_per_img):
            w = int(rng.uniform(20, 50))
            h = int(rng.uniform(20, 50))
            x1 = int(rng.uniform(5, size - w - 20))
            y1 = int(rng.uniform(5, size - h - 20))
            ox = float(rng.uniform(-12, 12))
            oy = float(rng.uniform(-12, 12))
            # roof polygon (rect), footprint = roof - offset
            roof = [x1, y1, x1 + w, y1, x1 + w, y1 + h, x1, y1 + h]
            fx1, fy1 = x1 - ox, y1 - oy
            footprint = [fx1, fy1, fx1 + w, fy1, fx1 + w, fy1 + h,
                         fx1, fy1 + h]
            bx1 = min(x1, fx1)
            by1 = min(y1, fy1)
            bx2 = max(x1 + w, fx1 + w)
            by2 = max(y1 + h, fy1 + h)
            img[y1:y1 + h, x1:x1 + w] = (200, 100, 100)
            annotations.append(dict(
                id=aid, image_id=i, category_id=1,
                bbox=[x1, y1, w, h],
                building_bbox=[bx1, by1, bx2 - bx1, by2 - by1],
                footprint_bbox=[fx1, fy1, w, h],
                segmentation=[roof],
                footprint_mask=footprint,
                offset=[ox, oy],
                building_height=float(rng.uniform(3, 30)),
                area=float(w * h), iscrowd=0,
            ))
            aid += 1
        cv2.imwrite(osp.join(img_dir, fname), img)
        images.append(dict(id=i, file_name=fname, width=size, height=size))
    dataset = dict(images=images, annotations=annotations,
                   categories=[dict(id=1, name="building")])
    json_path = osp.join(root, "bonai_test.json")
    with open(json_path, "w") as f:
        json.dump(dataset, f)
    return json_path, img_dir


TRAIN_PIPELINE = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True, with_mask=True,
         with_offset=True),
    dict(type="Resize", img_scale=(256, 256), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=0.5,
         direction=["horizontal", "vertical"]),
    dict(type="Normalize", mean=[123.675, 116.28, 103.53],
         std=[58.395, 57.12, 57.375], to_rgb=True),
    dict(type="Pad", size_divisor=32),
    dict(type="DefaultFormatBundle"),
    dict(type="Collect",
         keys=["img", "gt_bboxes", "gt_labels", "gt_masks", "gt_offsets"]),
]
