#!/usr/bin/env python
"""Generate a rich synthetic BONAI-format dataset.

Real BONAI data cannot be downloaded in this environment (zero egress),
so this generator produces the closest feasible stand-in for closing the
quality loop end-to-end (train -> bonai_test -> bonai_evaluation):

- 1024x1024 tiles with 15-110 buildings each (clustered city-block
  layout plus scattered singles);
- footprints are rotated rectangles and L/T-shaped polygons, log-normal
  size distribution;
- satellite geometry: each tile has ONE off-nadir direction and angle
  (as in a real acquisition) — every building's roof-to-footprint offset
  is ``height * tan(off_nadir) * ppm`` along that shared direction, so
  offset statistics mirror the real dataset's per-image coherence;
- rendering with painter's order along the view direction: ground,
  shadow, facade (the wall face connecting footprint to roof), then
  roof with per-building albedo + texture noise;
- annotations carry the full BONAI schema: roof ``segmentation``,
  ``footprint_mask``, ``building_bbox``, ``footprint_bbox``, ``offset``
  (roof -> footprint: footprint = roof - offset), ``building_height``,
  ``offset_angle`` per image.

Usage:
  python tools/make_synthetic_bonai.py --out /data/synth_bonai \
      --train 2000 --val 200 [--seed 0]
"""

import argparse
import json
import math
import os
import os.path as osp
import sys


import numpy as np


def _rot(points, angle, cx, cy):
    c, s = math.cos(angle), math.sin(angle)
    p = np.asarray(points, np.float64) - (cx, cy)
    return np.stack([p[:, 0] * c - p[:, 1] * s + cx,
                     p[:, 0] * s + p[:, 1] * c + cy], 1)


def _footprint_poly(rng, cx, cy, w, h, angle):
    """Rotated rect, or L/T shape built from two overlapping rects."""
    kind = rng.rand()
    if kind < 0.6:
        base = [(cx - w / 2, cy - h / 2), (cx + w / 2, cy - h / 2),
                (cx + w / 2, cy + h / 2), (cx - w / 2, cy + h / 2)]
        return [_rot(base, angle, cx, cy)]
    # L/T: union of two rects sharing a corner/edge (kept as two parts;
    # cv2.fillPoly unions them when rasterised, and the json stores the
    # multi-part polygon the same way real annotations do)
    w2 = w * rng.uniform(0.4, 0.7)
    h2 = h * rng.uniform(0.4, 0.7)
    dx = (w - w2) / 2 * (1 if rng.rand() < 0.5 else -1)
    dy = (h - h2) / 2
    a = [(cx - w / 2, cy - h / 2), (cx + w / 2, cy - h / 2),
         (cx + w / 2, cy - h / 2 + h2), (cx - w / 2, cy - h / 2 + h2)]
    b = [(cx + dx - w2 / 2, cy - h / 2 + h2),
         (cx + dx + w2 / 2, cy - h / 2 + h2),
         (cx + dx + w2 / 2, cy + h / 2), (cx + dx - w2 / 2, cy + h / 2)]
    return [_rot(a, angle, cx, cy), _rot(b, angle, cx, cy)]


def _union_outline(parts):
    """Single outline polygon of (possibly multi-part, edge-connected)
    parts via 2x-supersampled raster + contour extraction.  Needed
    because the BONAI schema stores ``footprint_mask`` as ONE polygon."""
    import cv2
    if len(parts) == 1:
        return parts[0]
    allp = np.concatenate(parts, 0)
    x0, y0 = np.floor(allp.min(0)) - 2
    ss = 2
    w = int((allp[:, 0].max() - x0 + 4) * ss)
    h = int((allp[:, 1].max() - y0 + 4) * ss)
    m = np.zeros((h, w), np.uint8)
    for p in parts:
        cv2.fillPoly(m, [np.round((p - (x0, y0)) * ss).astype(np.int32)], 1)
    cs, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    c = max(cs, key=cv2.contourArea)[:, 0, :].astype(np.float64)
    return c / ss + (x0, y0)


def _poly_bbox(parts):
    allp = np.concatenate(parts, 0)
    x1, y1 = allp.min(0)
    x2, y2 = allp.max(0)
    return float(x1), float(y1), float(x2), float(y2)


def make_tile(rng, size=1024):
    """Returns (image, list of building dicts, off-nadir meta)."""
    import cv2
    img = np.full((size, size, 3), 0, np.uint8)
    # ground: noise + patches + roads
    base = rng.randint(60, 110)
    img[:] = (base + rng.randn(size, size, 3) * 12).clip(0, 255)
    for _ in range(rng.randint(2, 6)):     # dirt/grass patches
        c = rng.randint(0, size, 2)
        r = rng.randint(60, 300)
        col = np.array([rng.randint(40, 90), rng.randint(70, 130),
                        rng.randint(60, 110)], float)
        cv2.circle(img, tuple(c), r, col + rng.randn(3) * 6, -1,
                   lineType=cv2.LINE_AA)
    for _ in range(rng.randint(2, 5)):     # roads
        p0 = rng.randint(0, size, 2)
        p1 = rng.randint(0, size, 2)
        cv2.line(img, tuple(p0), tuple(p1), (150, 150, 150),
                 rng.randint(8, 22))
    img = (img.astype(np.float32)
           + rng.randn(size, size, 3) * 6).clip(0, 255).astype(np.uint8)

    # one acquisition geometry per tile
    theta = rng.uniform(0, 2 * math.pi)           # offset direction
    off_nadir = rng.uniform(0.05, 0.55)           # radians-ish factor
    ppm = 1.7                                     # pixels per meter scale
    dirv = np.array([math.cos(theta), math.sin(theta)])

    # building placement: blocks + scatter
    n_target = rng.randint(15, 110)
    centers = []
    n_blocks = rng.randint(1, 5)
    blocks = [(rng.uniform(100, size - 100, 2),
               rng.uniform(0, 2 * math.pi)) for _ in range(n_blocks)]
    while len(centers) < n_target:
        if rng.rand() < 0.7 and blocks:
            bc, ba = blocks[rng.randint(len(blocks))]
            gx = rng.randint(-4, 5) * rng.uniform(45, 90)
            gy = rng.randint(-2, 3) * rng.uniform(45, 90)
            c, s = math.cos(ba), math.sin(ba)
            centers.append((bc[0] + gx * c - gy * s,
                            bc[1] + gx * s + gy * c))
        else:
            centers.append(tuple(rng.uniform(20, size - 20, 2)))
        if len(centers) > 4 * n_target:
            break
    buildings = []
    for cx, cy in centers[:n_target]:
        if not (0 <= cx < size and 0 <= cy < size):
            continue
        scale = float(np.exp(rng.normal(3.3, 0.55)))       # ~15-100px
        w = scale * rng.uniform(0.7, 1.4)
        h = scale * rng.uniform(0.7, 1.4)
        if w < 9 or h < 9:
            continue
        angle = rng.uniform(0, math.pi)
        height_m = float(np.exp(rng.normal(2.2, 0.7)))      # ~3-60 m
        off = dirv * height_m * math.tan(off_nadir) * ppm
        fp = _footprint_poly(rng, cx, cy, w, h, angle)
        roof = [p + off for p in fp]
        bx = _poly_bbox(fp + roof)
        if bx[0] < -10 or bx[1] < -10 or bx[2] > size + 10 \
                or bx[3] > size + 10:
            continue
        buildings.append(dict(fp=fp, roof=roof, off=off,
                              height=height_m, cx=cx, cy=cy))

    # painter's order: far-from-camera first (projected onto view dir)
    buildings.sort(key=lambda b: -(b["cx"] * dirv[0] + b["cy"] * dirv[1]))

    for b in buildings:
        albedo = np.array([rng.randint(70, 230) for _ in range(3)], float)
        facade = (albedo * 0.45).clip(20, 255)
        shadow_dir = -dirv
        # soft shadow on the ground
        sh = [np.round(p + shadow_dir * b["height"] * 0.9).astype(np.int32)
              for p in b["fp"]]
        overlay = img.copy()
        cv2.fillPoly(overlay, sh, (35, 35, 35))
        cv2.addWeighted(overlay, 0.4, img, 0.6, 0, img)
        # facade: convex hull of footprint+roof minus roof (approx: fill
        # hull with facade colour, roof painted after)
        for pf, pr in zip(b["fp"], b["roof"]):
            hull = cv2.convexHull(np.concatenate(
                [pf, pr], 0).astype(np.float32)).astype(np.int32)
            cv2.fillPoly(img, [hull.reshape(-1, 2)], facade)
        roof_col = albedo + rng.randn(3) * 5
        cv2.fillPoly(img, [np.round(p).astype(np.int32)
                           for p in b["roof"]], roof_col)
        # roof texture + ridge line
        x1, y1, x2, y2 = map(int, _poly_bbox(b["roof"]))
        x1, y1 = max(x1, 0), max(y1, 0)
        x2, y2 = min(x2, size), min(y2, size)
        if x2 > x1 and y2 > y1:
            patch = img[y1:y2, x1:x2].astype(np.float32)
            img[y1:y2, x1:x2] = (patch + rng.randn(
                y2 - y1, x2 - x1, 3) * 4).clip(0, 255).astype(np.uint8)
    return img, buildings, dict(theta=theta, off_nadir=off_nadir)


def write_split(out, name, n_tiles, seed, size=1024, stems=None):
    import cv2
    img_dir = osp.join(out, name, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    images, annotations = [], []
    aid = 1
    for i in range(n_tiles):
        img, buildings, meta = make_tile(rng, size)
        stem = stems(i) if stems else f"{name}_{i:05d}"
        fname = stem + ".png"
        cv2.imwrite(osp.join(img_dir, fname), img)
        images.append(dict(id=i, file_name=fname, width=size, height=size,
                           offset_angle=dict(angle=meta["off_nadir"])))
        for b in buildings:
            roof_parts = [p.reshape(-1).tolist() for p in b["roof"]]
            fp_poly = _union_outline(b["fp"]).reshape(-1).tolist()
            bx1, by1, bx2, by2 = _poly_bbox(b["fp"] + b["roof"])
            rx1, ry1, rx2, ry2 = _poly_bbox(b["roof"])
            fx1, fy1, fx2, fy2 = _poly_bbox(b["fp"])
            annotations.append(dict(
                id=aid, image_id=i, category_id=1,
                bbox=[rx1, ry1, rx2 - rx1, ry2 - ry1],
                building_bbox=[bx1, by1, bx2 - bx1, by2 - by1],
                footprint_bbox=[fx1, fy1, fx2 - fx1, fy2 - fy1],
                roof_bbox=[rx1, ry1, rx2 - rx1, ry2 - ry1],
                segmentation=roof_parts,
                footprint_mask=fp_poly,
                offset=[float(b["off"][0]), float(b["off"][1])],
                building_height=b["height"],
                area=float((rx2 - rx1) * (ry2 - ry1)),
                iscrowd=0, only_footprint=0,
            ))
            aid += 1
        if (i + 1) % 100 == 0:
            print(f"{name}: {i + 1}/{n_tiles}", flush=True)
    ds = dict(images=images, annotations=annotations,
              categories=[dict(id=1, name="building")])
    jp = osp.join(out, name, f"{name}.json")
    with open(jp, "w") as f:
        json.dump(ds, f)
    print(f"wrote {jp}: {len(images)} images, {len(annotations)} anns")
    return jp, img_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--train", type=int, default=2000)
    ap.add_argument("--val", type=int, default=200)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    write_split(args.out, "train", args.train, args.seed, args.size)
    # val tiles follow the crop-naming convention so the evaluator's
    # crop->scene merge path is exercised (reference merged-CSV protocol)
    def val_stem(i):
        scene, k = divmod(i, 4)
        return f"scene{scene:04d}__{(k % 2) * args.size}_" \
               f"{(k // 2) * args.size}"
    write_split(args.out, "val", args.val, args.seed + 77, args.size,
                stems=val_stem)


if __name__ == "__main__":
    main()
