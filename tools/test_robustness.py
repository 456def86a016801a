#!/usr/bin/env python
"""Corruption robustness benchmark (reference: ``tools/test_robustness.py``
+ ``robustness_eval.py`` — mPC aggregation).  The imagecorruptions package
is absent, so a native subset of corruptions is implemented in
``bonai_tpu/datasets/pipelines/corrupt.py``."""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from bonai_tpu import Config


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("checkpoint")
    parser.add_argument("--corruptions", nargs="+",
                        default=["gaussian_noise", "gaussian_blur",
                                 "brightness", "contrast"])
    parser.add_argument("--severities", type=int, nargs="+",
                        default=[1, 3, 5])
    parser.add_argument("--max-images", type=int, default=None)
    args = parser.parse_args()

    import numpy as np
    from bonai_tpu.apis import run_inference
    from bonai_tpu.apis.inference import init_detector
    from bonai_tpu.datasets import build_dataset, build_dataloader

    model, variables, cfg = init_detector(args.config, args.checkpoint)
    results_table = {}
    for corruption in [None] + args.corruptions:
        severities = [0] if corruption is None else args.severities
        for sev in severities:
            test_cfg = dict(cfg.data.test, test_mode=True)
            pipeline = [dict(t) for t in test_cfg["pipeline"]]
            if corruption is not None:
                pipeline.insert(1, dict(type="Corrupt",
                                        corruption=corruption,
                                        severity=sev))
            test_cfg["pipeline"] = pipeline
            ds = build_dataset(test_cfg)
            loader = build_dataloader(ds, samples_per_gpu=1, shuffle=False,
                                      train=False)
            results = run_inference(model, variables, loader,
                                    max_images=args.max_images,
                                    progress=False)
            metrics = ds.evaluate(results, metric="bbox")
            key = "clean" if corruption is None else f"{corruption}@{sev}"
            results_table[key] = metrics.get("bbox_mAP", -1)
            print(f"{key}: mAP {results_table[key]:.4f}")
    clean = results_table.get("clean", 0)
    pc = [v for k, v in results_table.items() if k != "clean"]
    if pc and clean > 0:
        mpc = float(np.mean(pc))
        print(f"mPC: {mpc:.4f}  rPC: {mpc / clean:.4f}")


if __name__ == "__main__":
    main()
