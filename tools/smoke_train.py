#!/usr/bin/env python
"""End-to-end smoke: synthetic BONAI dataset → short train → inference →
BONAI F1 evaluation.  The minimum end-to-end slice of SURVEY.md §7,
runnable on one TPU chip in a few minutes.

Usage: python tools/smoke_train.py [--steps 60] [--size 256]
"""

import argparse
import os.path as osp
import sys
import tempfile

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "tests"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=60)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--images", type=int, default=8)
    parser.add_argument("--lr", type=float, default=0.02)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from helpers import make_bonai_dataset, TRAIN_PIPELINE
    from bonai_tpu.datasets import BONAI, build_dataloader
    from bonai_tpu.engine import (build_lr_schedule, build_optimizer,
                                  create_train_state, make_train_step)
    from bonai_tpu.engine.optim import frozen_mask_from_model
    from bonai_tpu.models import build_detector
    from bonai_tpu.apis import run_inference
    from bonai_tpu.evaluation.bonai_eval import (results_to_csv_records,
                                                 polygon_f1,
                                                 offset_error_vector)
    from tools.smoke_common import small_loft_cfg

    tmp = tempfile.mkdtemp(prefix="bonai_smoke_")
    json_path, img_dir = make_bonai_dataset(tmp, num_images=args.images,
                                            size=args.size,
                                            buildings_per_img=6)
    pipeline = [dict(t) for t in TRAIN_PIPELINE]
    pipeline[2] = dict(type="Resize", img_scale=(args.size, args.size),
                       keep_ratio=True)
    dataset = BONAI(ann_file=json_path, pipeline=pipeline,
                    img_prefix=img_dir, bbox_type="building",
                    mask_type="roof")
    loader = build_dataloader(dataset, samples_per_gpu=4, seed=0,
                              max_gt=16, inst_mask_size=64)

    model_cfg, train_cfg, test_cfg = small_loft_cfg()
    model = build_detector(model_cfg, train_cfg, test_cfg,
                           compute_dtype="bfloat16")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    schedule = build_lr_schedule(args.lr, 100, [], 100, warmup="linear",
                                 warmup_iters=20, warmup_ratio=0.1)
    frozen = frozen_mask_from_model(variables["params"], -1)
    tx = build_optimizer(dict(type="SGD", lr=args.lr, momentum=0.9,
                              weight_decay=1e-4), schedule,
                         dict(max_norm=35), frozen)
    state = create_train_state(variables["params"],
                               variables.get("batch_stats", {}), tx)
    step = make_train_step(model, tx, mesh=None, donate=False)

    rng = jax.random.PRNGKey(1)
    it = 0
    first = last = None
    import time
    t0 = time.time()
    while it < args.steps:
        for batch, _ in loader:
            if it >= args.steps:
                break
            state, metrics = step(state, batch, jax.random.fold_in(rng, it))
            loss = float(metrics["loss"])
            if first is None:
                first = loss
                print(f"[{time.time()-t0:.0f}s] compiled; initial loss "
                      f"{loss:.3f}")
            last = loss
            if it % 10 == 0:
                print(f"step {it}: loss {loss:.3f} "
                      + " ".join(f"{k}={float(v):.3f}"
                                 for k, v in metrics.items()
                                 if k.startswith("loss_")))
            it += 1
        loader.set_epoch(it)

    print(f"loss {first:.2f} -> {last:.2f}")
    assert last < first * 0.8, "loss did not decrease"

    # inference + eval on the train images (overfit sanity)
    eval_loader = build_dataloader(dataset, samples_per_gpu=4,
                                   shuffle=False, train=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    results = run_inference(model, variables, eval_loader, progress=False)
    fnames = [d["filename"] for d in dataset.data_infos]
    pred = results_to_csv_records(results, fnames, score_thr=0.3,
                                  min_area=50)
    import tools.bonai.bonai_evaluation as be
    gt = be.gt_records_from_json(json_path, min_area=50)
    gt = {osp.basename(k) if False else k: v for k, v in gt.items()}
    # prediction fnames are full paths; map to file_name
    pred = {osp.basename(k): v for k, v in pred.items()}
    roof, matches = polygon_f1(pred, gt, iou_thr=0.3)
    fp_m, fp_matches = polygon_f1(pred, gt, iou_thr=0.3,
                                  key="footprint_polygon")
    off = offset_error_vector(pred, gt, fp_matches)
    print(f"roof F1={roof['f1']:.3f} (TP={roof['tp']} FP={roof['fp']} "
          f"FN={roof['fn']}) footprint F1={fp_m['f1']:.3f} "
          f"aEPE={off['aEPE']:.2f}")
    print("SMOKE OK" if roof["f1"] > 0.3 else "SMOKE WEAK (f1 <= 0.3)")


if __name__ == "__main__":
    main()
