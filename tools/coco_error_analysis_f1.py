#!/usr/bin/env python
"""COCO error analysis with F1 curves.

reference: ``tools/coco_error_analysis_f1.py:1-229`` — per-class stacked
PR curves with progressive error removal (C75 / C50 / Loc@0.3 /
Sim / Oth / BG / FN), the F1-over-recall variant, and a ``maxF1score.txt``
listing the best-F1 operating point per curve.

Consumes the pkl written by ``tools/test.py`` / ``tools/bonai/
bonai_test.py`` plus the GT json (pycocotools is replaced in-repo by
``bonai_tpu.evaluation.coco_eval``).
"""

import argparse
import os
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

CURVE_TYPES = ["C75", "C50", "Loc", "Sim", "Oth", "BG", "FN"]
CURVE_COLORS = [(0.31, 0.51, 0.74), (0.75, 0.31, 0.30),
                (0.36, 0.90, 0.38), (0.50, 0.39, 0.64), (1.0, 0.6, 0.0),
                (0.83, 0.83, 0.83), (0.93, 0.93, 0.93)]


def compute_curves(dataset, results, cls, metric="bbox", max_dets=1500):
    """Stacked precision curves (7, 101) for one class."""
    from bonai_tpu.evaluation.coco_eval import (coco_pr_curve,
                                                per_image_records)
    plain = per_image_records(dataset, results, cls, metric)
    ignore = per_image_records(dataset, results, cls, metric,
                               ignore_other_classes=True)
    rs, c75 = coco_pr_curve(plain, 0.75, max_dets)
    _, c50 = coco_pr_curve(plain, 0.50, max_dets)
    _, loc = coco_pr_curve(plain, 0.30, max_dets)
    # single supercategory assumption (BONAI: one class) -> Sim == Oth
    _, oth = coco_pr_curve(ignore, 0.30, max_dets)
    sim = oth
    bg = (oth > 0).astype(float)
    fn = np.ones_like(bg)
    ps = np.stack([c75, c50, loc, sim, oth, bg, fn])
    # stacking requires monotone non-decreasing curves across error types
    ps = np.maximum.accumulate(ps, axis=0)
    return rs, ps


def _plot(rs, ps, out_dir, class_name, metric, f1=False, f1_log=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    title = f"{metric}-{class_name}" + ("-F1" if f1 else "")
    fig = plt.figure()
    ax = plt.subplot(111)
    prev = np.zeros_like(ps[0])
    for k, name in enumerate(CURVE_TYPES):
        curve = ps[k].copy()
        if f1:
            curve = 2 * rs * curve / (rs + curve + 1e-6)
            if f1_log is not None:
                i = int(np.argmax(curve))
                f1_log.write(f"{class_name} {name}: maxF1={curve[i]:.4f} "
                             f"precision={ps[k][i]:.4f} recall={rs[i]:.4f}\n")
        auc = ps[k].mean()
        ax.plot(rs, curve, color="k", linewidth=0.5)
        ax.fill_between(rs, prev, np.maximum(prev, curve),
                        color=CURVE_COLORS[k],
                        label=f"[{auc:.3f}]{name}")
        prev = np.maximum(prev, curve)
    plt.xlabel("recall")
    plt.ylabel("F1" if f1 else "precision")
    plt.xlim(0, 1.0)
    plt.ylim(0, 1.0)
    plt.title(title)
    plt.legend()
    fig.savefig(osp.join(out_dir, f"{title}.png"))
    plt.close(fig)


def analyze(results, dataset, out_dir, metrics=("bbox",), with_f1=True):
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for metric in metrics:
        mdir = osp.join(out_dir, metric)
        os.makedirs(mdir, exist_ok=True)
        f1_log = open(osp.join(mdir, "maxF1score.txt"), "w") \
            if with_f1 else None
        all_ps = []
        for c, name in enumerate(dataset.CLASSES):
            rs, ps = compute_curves(dataset, results, c, metric)
            all_ps.append(ps)
            _plot(rs, ps, mdir, name, metric)
            if with_f1:
                _plot(rs, ps, mdir, name, metric, f1=True, f1_log=f1_log)
        mean_ps = np.mean(all_ps, axis=0)
        _plot(rs, mean_ps, mdir, "allclass", metric)
        if with_f1:
            _plot(rs, mean_ps, mdir, "allclass", metric, f1=True,
                  f1_log=f1_log)
            f1_log.close()
        written.append(mdir)
    return written


def main(with_f1=True):
    parser = argparse.ArgumentParser(description="COCO error analysis")
    parser.add_argument("result", help="pkl results from tools/test.py")
    parser.add_argument("out_dir")
    parser.add_argument("--ann", required=True, help="GT coco json")
    parser.add_argument("--img-prefix", default="")
    parser.add_argument("--types", nargs="+", default=["bbox"])
    parser.add_argument("--dataset-type", default="BONAI")
    args = parser.parse_args()

    from bonai_tpu.datasets import build_dataset
    dataset = build_dataset(dict(
        type=args.dataset_type, ann_file=args.ann,
        img_prefix=args.img_prefix, test_mode=True,
        pipeline=[dict(type="LoadImageFromFile"),
                  dict(type="Collect", keys=["img"])]))
    with open(args.result, "rb") as f:
        payload = pickle.load(f)
    results = payload["results"] if isinstance(payload, dict) else payload
    dirs = analyze(results, dataset, args.out_dir, tuple(args.types),
                   with_f1=with_f1)
    print("wrote " + ", ".join(dirs))


if __name__ == "__main__":
    main(with_f1=True)
