#!/usr/bin/env python
"""BONAI test CLI (reference: ``tools/bonai/bonai_test.py:86-179``) —
inference over the BONAI test split, dumping the pkl results the
evaluation tool consumes."""

import argparse
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

from bonai_tpu import Config


def main():
    parser = argparse.ArgumentParser(description="BONAI test")
    parser.add_argument("config")
    parser.add_argument("checkpoint")
    parser.add_argument("--out", required=True, help="output pkl")
    parser.add_argument("--city", default="shanghai_xian")
    parser.add_argument("--nms-score", type=float, default=None,
                        help="override rcnn nms iou_threshold")
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--aug-test", action="store_true",
                        help="multi-view TTA (h+v flip or the views "
                             "declared by MultiScaleFlipAug)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from bonai_tpu.apis import run_inference
    from bonai_tpu.datasets import build_dataset, build_dataloader
    from bonai_tpu.engine import create_train_state, load_checkpoint
    from bonai_tpu.models import build_detector

    cfg = Config.fromfile(args.config)
    # pin the shanghai+xian test set (reference bonai_test.py:108-113);
    # --city config keeps the config's data.test untouched (synthetic /
    # custom datasets)
    data_root = cfg.get("data_root", "data/BONAI/")
    test_cfg = dict(cfg.data.test)
    if args.city != "config":
        test_cfg["ann_file"] = (
            data_root + f"coco/bonai_{args.city}_test.json")
        test_cfg["img_prefix"] = data_root + "test/images/"
    test_cfg["test_mode"] = True
    if args.nms_score is not None:
        cfg.test_cfg.rcnn.nms.iou_threshold = args.nms_score

    dataset = build_dataset(test_cfg)
    loader = build_dataloader(
        dataset, samples_per_gpu=cfg.data.get("samples_per_gpu", 2),
        shuffle=False, train=False)
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
    payload = dict(results=results,
                   filenames=[d["filename"] for d in dataset.data_infos])
    with open(args.out, "wb") as f:
        pickle.dump(payload, f)
    print(f"wrote {args.out} ({len(results)} images)")


if __name__ == "__main__":
    main()
