#!/usr/bin/env python
"""Evaluation CLI (reference: ``tools/test.py``).

Usage: python tools/test.py CONFIG CHECKPOINT [--out results.pkl]
       [--eval bbox segm]
"""

import argparse
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from bonai_tpu import Config


def main():
    parser = argparse.ArgumentParser(description="Test a detector")
    parser.add_argument("config")
    parser.add_argument("checkpoint")
    parser.add_argument("--out", default=None, help="pkl results path")
    parser.add_argument("--eval", nargs="+", default=None,
                        help="metrics: bbox segm")
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--options", nargs="+", default=None)
    parser.add_argument("--aug-test", action="store_true",
                        help="multi-view TTA (scales x flips declared by "
                             "MultiScaleFlipAug in the test pipeline; "
                             "defaults to h+v flip)")
    parser.add_argument("--aug-test-mode", default="det",
                        choices=["det", "proposal"],
                        help="TTA merge level: det (cheap, NMS over "
                             "per-view detections) or proposal "
                             "(reference merge_aug_proposals/_bboxes/"
                             "_masks parity)")
    args = parser.parse_args()

    import jax.numpy as jnp
    import jax
    from bonai_tpu.apis import run_inference
    from bonai_tpu.datasets import build_dataset, build_dataloader
    from bonai_tpu.engine import (create_train_state, load_checkpoint)
    from bonai_tpu.models import build_detector
    import optax

    cfg = Config.fromfile(args.config)
    if args.options:
        from tools.train import parse_options
        cfg.merge_from_dict(parse_options(args.options))

    dataset = build_dataset(dict(cfg.data.test, test_mode=True))
    loader = build_dataloader(
        dataset, samples_per_gpu=cfg.data.get("samples_per_gpu", 2),
        shuffle=False, train=False,
        max_gt=cfg.data.get("max_gt", 256),
        inst_mask_size=cfg.data.get("inst_mask_size", 112))

    model = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg,
                           compute_dtype=cfg.get("compute_dtype",
                                                 "bfloat16"))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    if args.checkpoint.endswith(".pth"):
        from bonai_tpu.utils import (import_torch_state_dict,
                                     mmdet_checkpoint_to_params)
        sd = import_torch_state_dict(args.checkpoint)
        params, batch_stats = mmdet_checkpoint_to_params(
            sd, variables["params"], variables.get("batch_stats", {}))
        variables = {"params": params, "batch_stats": batch_stats}
    else:
        from bonai_tpu.engine.checkpoint import load_params_only
        params, batch_stats = load_params_only(args.checkpoint)
        variables = {"params": params, "batch_stats": batch_stats}

    tta = None
    if args.aug_test:
        from bonai_tpu.apis.test import tta_cfg_from_pipeline
        tta = tta_cfg_from_pipeline(dataset)
        tta["mode"] = args.aug_test_mode
        print(f"aug-test views: {tta}")
    results = run_inference(model, variables, loader,
                            max_images=args.max_images, tta=tta)
    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump(results, f)
        print(f"wrote {args.out}")
    if args.eval:
        from bonai_tpu.evaluation.coco_eval import evaluate_coco
        metrics = evaluate_coco(dataset, results, metric_types=args.eval)
        for k, v in metrics.items():
            print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
