"""Training orchestration (replaces mmcv Runner + hooks).

reference: ``mmdet/apis/train.py:34-143``.  The EpochBasedRunner/hook
machinery becomes a plain epoch loop around one compiled, data-parallel
train step; LR scheduling, grad clipping, checkpointing and logging are
explicit.
"""

from __future__ import annotations

import json
import logging
import os
import os.path as osp
import random
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..datasets import build_dataset, build_dataloader
from ..engine import (build_optimizer, build_lr_schedule, create_train_state,
                      make_train_step, save_checkpoint, load_checkpoint,
                      latest_checkpoint)
from ..engine.optim import frozen_mask_from_model
from ..engine.train_step import make_mesh
from ..models import build_detector

logger = logging.getLogger("bonai_tpu")


def set_random_seed(seed, deterministic=False):
    """reference: ``apis/train.py:15-31``."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def _run_validation(model, state, cfg, metrics_log, val_ds):
    """Epoch-end validation (reference ``EvalHook``:
    ``core/evaluation/eval_hooks.py:7-37`` → ``dataset.evaluate``).
    ``val_ds`` is built once up-front in :func:`train_detector` so a
    misconfigured val path fails at startup, not silently every epoch."""
    from ..apis.test import run_inference
    from ..datasets import build_dataloader
    from ..evaluation.coco_eval import evaluate_coco
    loader = build_dataloader(val_ds, samples_per_gpu=cfg.data.get(
        "samples_per_gpu", 2), shuffle=False, train=False)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    results = run_inference(model, variables, loader, progress=False)
    metric_types = cfg.get("evaluation", {}).get("metric", ["bbox"])
    if isinstance(metric_types, str):
        metric_types = [metric_types]
    metric_types = [m for m in metric_types if m in ("bbox", "segm")]
    metrics = evaluate_coco(val_ds, results, metric_types=metric_types)
    logger.info("validation: %s",
                " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))
    metrics_log.append(metrics)
    return metrics


def train_detector(cfg, work_dir, seed=0, resume_from=None, load_from=None,
                   max_steps=None, n_devices=None, log_interval=None,
                   checkpoint_interval=None, dataset=None, validate=False):
    """Run the full training recipe from a reference-format config."""
    os.makedirs(work_dir, exist_ok=True)
    rng = set_random_seed(seed)

    mesh = make_mesh(n_devices)
    nd = mesh.devices.size
    logger.info("devices: %d (%s)", nd, mesh.devices.ravel()[0].platform)

    if dataset is None:
        dataset = build_dataset(cfg.data.train)
    data_cfg = cfg.data
    loader = build_dataloader(
        dataset, samples_per_gpu=data_cfg.get("samples_per_gpu", 2),
        workers_per_gpu=data_cfg.get("workers_per_gpu", 2),
        num_devices=nd, seed=seed,
        max_gt=data_cfg.get("max_gt", 256),
        inst_mask_size=data_cfg.get("inst_mask_size", 112),
        loader_mode=data_cfg.get("loader_mode", "thread"))
    steps_per_epoch = max(len(loader), 1)
    total_epochs = cfg.get("total_epochs", 12)

    # build the val dataset up-front: a typo'd val path must fail at
    # startup, not be swallowed into a per-epoch warning
    val_ds = None
    if validate and cfg.get("evaluation", {}).get("interval", 0):
        val_ds = build_dataset(dict(cfg.data.val, test_mode=True))

    model = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg,
                           compute_dtype=cfg.get("compute_dtype", "bfloat16"))
    init_rng, rng = jax.random.split(rng)
    sample_shape = (1, 64, 64, 3)
    variables = model.init(init_rng, jnp.zeros(sample_shape))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if cfg.model.get("pretrained"):
        from ..utils.torch_import import load_pretrained_backbone
        params, batch_stats = load_pretrained_backbone(
            cfg.model["pretrained"], params, batch_stats)

    opt_cfg = dict(cfg.optimizer)
    # Config lr is used as-is by default (mmdet convention: users scale lr
    # manually when changing GPU count).  Opt-in linear scaling: set
    # ``auto_scale_lr = dict(enable=True, base_batch_size=N)`` and the lr
    # is multiplied by (samples_per_gpu * n_devices) / base_batch_size.
    asl = dict(cfg.get("auto_scale_lr", {}) or {})
    if asl.get("enable", False):
        base_bs = int(asl.get("base_batch_size", 8))
        global_bs = data_cfg.get("samples_per_gpu", 2) * nd
        scale = global_bs / base_bs
        opt_cfg["lr"] = opt_cfg.get("lr", 0.02) * scale
        logger.info("auto_scale_lr: global batch %d vs base %d -> lr %.6f",
                    global_bs, base_bs, opt_cfg["lr"])
    lr_cfg = dict(cfg.get("lr_config", {}))
    schedule = build_lr_schedule(
        base_lr=opt_cfg.get("lr", 0.02), steps_per_epoch=steps_per_epoch,
        step_epochs=list(lr_cfg.get("step", [])),
        total_epochs=total_epochs,
        warmup=lr_cfg.get("warmup", None),
        warmup_iters=lr_cfg.get("warmup_iters", 0),
        warmup_ratio=lr_cfg.get("warmup_ratio", 0.1))
    frozen = frozen_mask_from_model(
        params, cfg.model.backbone.get("frozen_stages", -1))
    grad_clip = dict(cfg.get("optimizer_config", {}).get("grad_clip") or {})
    tx = build_optimizer(opt_cfg, schedule, grad_clip or None, frozen)
    state = create_train_state(params, batch_stats, tx)

    if resume_from or (resume_from is None and cfg.get("resume_from")):
        path = resume_from or cfg.get("resume_from")
        state = load_checkpoint(path, state)
        logger.info("resumed from %s at step %d", path, int(state.step))
    elif load_from or cfg.get("load_from"):
        # weights-only load (reference load_from semantics: no optimizer
        # state, step restarts at 0 — ``apis/train.py:139-142``)
        path = load_from or cfg.get("load_from")
        if str(path).endswith(".pth"):
            from ..utils import (import_torch_state_dict,
                                 mmdet_checkpoint_to_params)
            sd = import_torch_state_dict(path)
            p2, bs2 = mmdet_checkpoint_to_params(
                sd, state.params, state.batch_stats)
            state = state.replace(params=p2, batch_stats=bs2)
        else:
            loaded = load_checkpoint(path, state)
            state = state.replace(params=loaded.params,
                                  batch_stats=loaded.batch_stats)
        logger.info("loaded weights from %s", path)

    # deferred (device-side) normalisation: Normalize(device=True) in the
    # train pipeline keeps images uint8 on the host; the step gets the
    # constants and fuses the float math into the compiled program
    img_norm = None
    tcfg = cfg.data.get("train") or {}
    while isinstance(tcfg, dict) and "pipeline" not in tcfg \
            and "dataset" in tcfg:          # Repeat/ClassBalanced wrappers
        tcfg = tcfg["dataset"]
    for tr in tcfg.get("pipeline", []):
        if isinstance(tr, dict) and tr.get("type") == "Normalize" \
                and tr.get("device"):
            img_norm = dict(mean=tr["mean"], std=tr["std"])
    train_step = make_train_step(model, tx, mesh=mesh,
                                 lr_schedule=schedule, img_norm=img_norm,
                                 donate_batch=True)
    log_interval = log_interval or cfg.get("log_config", {}).get("interval", 10)
    ckpt_interval = checkpoint_interval or cfg.get(
        "checkpoint_config", {}).get("interval", 1)
    # reference CheckpointHook max_keep_ckpts: -1/None keeps everything
    ckpt_max_keep = cfg.get("checkpoint_config", {}).get("max_keep_ckpts")
    if ckpt_max_keep is not None and ckpt_max_keep <= 0:
        ckpt_max_keep = None

    from ..engine.checkpoint import provenance_meta
    provenance = provenance_meta(cfg, getattr(dataset, "CLASSES", None))

    # Dynamic R-CNN host-side hyperparameter schedule (reference
    # ``mmdet/models/roi_heads/dynamic_roi_head.py:103-150``): the
    # compiled step emits "stat_dyn_*" metrics; every
    # update_iter_interval iterations the IoU threshold / SmoothL1 beta
    # fed back into the step are refreshed from their history.
    dyn_cfg = None
    tc = cfg.get("train_cfg") or {}
    if isinstance(tc, dict):
        dyn_cfg = (tc.get("rcnn") or {}).get("dynamic_rcnn")
    if dyn_cfg:
        dyn_iou = float(dyn_cfg.get("initial_iou", 0.4))
        dyn_beta = float(dyn_cfg.get("initial_beta", 1.0))
        dyn_interval = int(dyn_cfg.get("update_iter_interval", 100))
        dyn_iou_hist, dyn_beta_hist = [], []

    log_path = osp.join(work_dir, "train_log.jsonl")
    start_step = int(state.step)
    start_epoch = start_step // steps_per_epoch
    step = start_step
    t0 = time.time()
    history = []

    # Host-RSS watchdog (round-5 post-mortem: the tunneled TPU platform
    # leaked host transfer buffers until the kernel OOM-killed two long
    # runs at 128 GB with empty logs).  RSS is logged every interval; past
    # the threshold the run checkpoints and exits cleanly with code 75 so
    # a wrapper (tools/train_chunked.sh) can resume in a fresh process.
    max_rss_gb = float(os.environ.get("BONAI_MAX_RSS_GB", "100"))

    def host_rss_gb():
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        return int(line.split()[1]) / 1e6
        except OSError:
            pass
        return 0.0

    from ..engine.train_step import device_prefetch
    for epoch in range(start_epoch, total_epochs):
        loader.set_epoch(epoch)
        for batch, _metas in device_prefetch(loader, mesh=mesh):
            if max_steps is not None and step >= max_steps:
                break
            step_rng = jax.random.fold_in(rng, step)
            if dyn_cfg:
                batch = dict(batch, dyn_iou_thr=jnp.float32(dyn_iou),
                             dyn_beta=jnp.float32(dyn_beta))
            state, metrics = train_step(state, batch, step_rng)
            step += 1
            if dyn_cfg:
                # keep device scalars; force them only at update time
                dyn_iou_hist.append(metrics.pop("stat_dyn_iou"))
                dyn_beta_hist.append(metrics.pop("stat_dyn_beta"))
                if len(dyn_iou_hist) >= dyn_interval:
                    ious = [float(x) for x in dyn_iou_hist]
                    betas = [v for v in (float(x) for x in dyn_beta_hist)
                             if v >= 0]
                    dyn_iou = max(float(dyn_cfg.get("initial_iou", 0.4)),
                                  float(np.mean(ious)))
                    if betas:
                        dyn_beta = min(
                            float(dyn_cfg.get("initial_beta", 1.0)),
                            float(np.median(betas)))
                    dyn_iou_hist, dyn_beta_hist = [], []
                    logger.info("dynamic-rcnn update: iou_thr=%.3f "
                                "beta=%.3f", dyn_iou, dyn_beta)
            if step % log_interval == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = (time.time() - t0) / log_interval
                t0 = time.time()
                rss = host_rss_gb()
                rec = dict(epoch=epoch + 1, iter=step, time=round(dt, 3),
                           host_rss_gb=round(rss, 2),
                           **{k: round(v, 4) for k, v in metrics.items()})
                if loader.truncated_samples:
                    rec["gt_truncated"] = loader.truncated_instances
                    rec["gt_truncated_samples"] = loader.truncated_samples
                history.append(rec)
                logger.info("Epoch [%d][%d/%d] %s", epoch + 1,
                            step - epoch * steps_per_epoch, steps_per_epoch,
                            " ".join(f"{k}: {v:.4f}"
                                     for k, v in metrics.items()))
                with open(log_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                if rss > max_rss_gb:
                    logger.warning(
                        "host RSS %.1f GB > BONAI_MAX_RSS_GB=%.0f; "
                        "checkpointing and exiting 75 for a clean "
                        "restart", rss, max_rss_gb)
                    save_checkpoint(work_dir, step, state,
                                    meta=dict(epoch=epoch + 1, step=step,
                                              preempt_rss=rss,
                                              **provenance))
                    sys.exit(75)
        if max_steps is not None and step >= max_steps:
            break
        if (epoch + 1) % ckpt_interval == 0:
            save_checkpoint(work_dir, step, state,
                            meta=dict(epoch=epoch + 1, step=step,
                                      **provenance),
                            max_keep=ckpt_max_keep)
        eval_interval = cfg.get("evaluation", {}).get("interval", 0)
        if validate and eval_interval and (epoch + 1) % eval_interval == 0:
            _run_validation(model, state, cfg, history, val_ds)
    save_checkpoint(work_dir, step, state,
                    meta=dict(final=True, step=step, **provenance))
    return state, history
