#!/usr/bin/env python
"""Visualise pipeline outputs (reference: ``tools/browse_dataset.py``)."""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

from bonai_tpu import Config
from bonai_tpu.datasets import build_dataset


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--output-dir", default="work_dirs/browse")
    parser.add_argument("--num", type=int, default=10)
    args = parser.parse_args()

    import cv2
    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg.data.train)
    os.makedirs(args.output_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(min(args.num, len(dataset))):
        res = dataset.prepare(i, rng)
        if res is None:
            continue
        img = res["img"]
        norm = res.get("img_norm_cfg")
        if norm is not None:
            img = res["img"] * norm["std"] + norm["mean"]
            if norm["to_rgb"]:
                img = img[..., ::-1]    # back to BGR for cv2
        img = np.clip(img, 0, 255).astype(np.uint8).copy()
        for j, box in enumerate(res.get("gt_bboxes", [])):
            x1, y1, x2, y2 = box.astype(int)
            cv2.rectangle(img, (x1, y1), (x2, y2), (0, 255, 0), 2)
            off = res.get("gt_offsets")
            if off is not None:
                cx, cy = int((x1 + x2) / 2), int((y1 + y2) / 2)
                cv2.arrowedLine(img, (cx, cy),
                                (int(cx - off[j][0]), int(cy - off[j][1])),
                                (0, 0, 255), 2)
            for part in res.get("gt_masks", [[]])[j]:
                cv2.polylines(img, [part.astype(np.int32)], True,
                              (255, 0, 0), 1)
        out = osp.join(args.output_dir, f"sample_{i}.png")
        cv2.imwrite(out, img)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
