#!/usr/bin/env python
"""Corruption robustness benchmark (reference: ``tools/test_robustness.py``
— per-corruption x per-severity evaluation, aggregated pkl, final mPC/rPC
prints via ``robustness_eval.py``).  The imagecorruptions package is
absent, so a native subset of corruptions is implemented in
``bonai_tpu/datasets/pipelines/corrupt.py``.

Writes ``--out``'s sibling ``*_results.pkl`` with the reference structure
``{corruption: {severity: {task: {metric: value}}}}`` (severity 0 = clean,
evaluated once and shared), which ``tools/robustness_eval.py`` consumes.
"""

import argparse
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from bonai_tpu import Config

BENCHMARK_CORRUPTIONS = [
    "gaussian_noise", "shot_noise", "impulse_noise", "defocus_blur",
    "glass_blur", "motion_blur", "zoom_blur", "snow", "frost", "fog",
    "brightness", "contrast", "elastic_transform", "pixelate",
    "jpeg_compression",
]


def _coco_metric_dict(metrics, task):
    """Map our evaluate() keys onto the reference AP-name table."""
    m = {
        "AP": metrics.get(f"{task}_mAP", 0.0),
        "AP50": metrics.get(f"{task}_mAP_50", 0.0),
        "AP75": metrics.get(f"{task}_mAP_75", 0.0),
    }
    for name, key in [("APs", f"{task}_mAP_s"), ("APm", f"{task}_mAP_m"),
                      ("APl", f"{task}_mAP_l"), ("AR100", "AR@100"),
                      ("AR300", "AR@300"), ("AR1000", "AR@1000")]:
        if key in metrics:
            m[name] = metrics[key]
    return m


def main():
    parser = argparse.ArgumentParser(
        description="Corruption robustness benchmark")
    parser.add_argument("config")
    parser.add_argument("checkpoint")
    parser.add_argument("--out", default=None,
                        help="raw results pkl; aggregated eval saved "
                             "beside it as *_results.pkl")
    parser.add_argument("--corruptions", nargs="+",
                        default=["benchmark"],
                        help="'benchmark' (all 15), 'noise', 'blur', "
                             "'weather', 'digital', or explicit names")
    parser.add_argument("--severities", type=int, nargs="+",
                        default=[0, 1, 2, 3, 4, 5])
    parser.add_argument("--eval", nargs="+", default=["bbox"],
                        choices=["bbox", "segm"])
    parser.add_argument("--iou-thr", type=float, default=0.5)
    parser.add_argument("--final-prints", nargs="+", default=["P", "mPC",
                                                              "rPC"],
                        choices=["P", "mPC", "rPC"])
    parser.add_argument("--max-images", type=int, default=None)
    args = parser.parse_args()

    groups = dict(
        benchmark=BENCHMARK_CORRUPTIONS,
        noise=["gaussian_noise", "shot_noise", "impulse_noise"],
        blur=["defocus_blur", "glass_blur", "motion_blur", "zoom_blur"],
        weather=["snow", "frost", "fog", "brightness"],
        digital=["contrast", "elastic_transform", "pixelate",
                 "jpeg_compression"],
    )
    corruptions = []
    for c in args.corruptions:
        corruptions.extend(groups.get(c, [c]))

    import numpy as np
    from bonai_tpu.apis import run_inference
    from bonai_tpu.apis.inference import init_detector
    from bonai_tpu.datasets import build_dataset, build_dataloader

    model, variables, cfg = init_detector(args.config, args.checkpoint)
    is_voc = str(cfg.data.test.get("type", "")).startswith("VOC")

    aggregated = {}
    clean_eval = None
    for corruption in corruptions:
        aggregated[corruption] = {}
        for sev in args.severities:
            if sev == 0:
                if clean_eval is not None:        # clean evaluated once
                    aggregated[corruption][0] = clean_eval
                    continue
            test_cfg = dict(cfg.data.test, test_mode=True)
            pipeline = [dict(t) for t in test_cfg["pipeline"]]
            if sev > 0:
                pipeline.insert(1, dict(type="Corrupt",
                                        corruption=corruption,
                                        severity=sev))
            test_cfg["pipeline"] = pipeline
            print(f"\nTesting {corruption} at severity {sev}")
            ds = build_dataset(test_cfg)
            loader = build_dataloader(ds, samples_per_gpu=1, shuffle=False,
                                      train=False)
            results = run_inference(model, variables, loader,
                                    max_images=args.max_images,
                                    progress=False)
            if is_voc:
                from bonai_tpu.evaluation.mean_ap import eval_map
                anns = [ds.get_ann_info(i) for i in range(len(results))]
                dets = [r[0] if isinstance(r, tuple) else r
                        for r in results]
                _, per_class = eval_map(dets, anns, iou_thr=args.iou_thr)
                entry = [{"ap": c["ap"]} for c in per_class]
            else:
                metrics = ds.evaluate(results, metric=list(args.eval))
                entry = {t: _coco_metric_dict(metrics, t)
                         for t in args.eval}
            aggregated[corruption][sev] = entry
            if sev == 0:
                clean_eval = entry
            if args.out:
                results_file = (osp.splitext(args.out)[0] + "_results"
                                + ".pkl")
                with open(results_file, "wb") as f:
                    pickle.dump(aggregated, f)

    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump(aggregated, f)

    print("\nAggregated results:")
    from robustness_eval import get_results
    np.seterr(invalid="ignore")
    for task in (["bbox"] if is_voc else list(args.eval)):
        get_results(aggregated, dataset="voc" if is_voc else "coco",
                    task=task, prints=list(args.final_prints),
                    aggregate="all")


if __name__ == "__main__":
    main()
