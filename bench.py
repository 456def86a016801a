#!/usr/bin/env python
"""Benchmark: LOFT+FOA train-step throughput (images/sec/chip) on the real
BONAI workload shape — 1024x1024 tiles, batch per chip 2 (the reference's
``samples_per_gpu=2``), full model (R50+FPN+RPN+bbox/mask/FOA heads),
full loss graph including assignment/sampling/NMS.

Baseline: the PyTorch reference on V100 runs Mask R-CNN at 0.265 s/iter for
2 imgs/GPU at ~800x1333 (reference docs/model_zoo.md:202-208), which scales
to ~0.42 s/iter at 1024² plus the FOA offset branch (10 convs x 4 rotation
branches on 256 RoIs ≈ +35% step time) → ≈ 3.5 img/s/GPU for LOFT-FOA.
``vs_baseline`` reports our img/s/chip against that 3.5 img/s/GPU figure
(BASELINE.md north star: >3x).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_IMG_PER_SEC = 3.5
REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def _check_devices(attempts=(240, 300, 360), pause_s=30):
    """The tunneled TPU platform can wedge (stale claim held by a killed
    process); a fresh process re-attempts the claim and the stale one
    expires after a few minutes.  So: probe ``jax.devices()`` in a child
    process with a timeout, and retry with backoff instead of giving up on
    the first hang (round-1 failure mode: single 240s probe, rc=2, no
    bench number captured)."""
    probe = ("import jax; d = jax.devices(); "
             "print('devices:', [str(x) for x in d])")
    for i, timeout_s in enumerate(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               timeout=timeout_s, capture_output=True,
                               text=True)
            if r.returncode == 0:
                if i:
                    print(f"bench: device init ok on attempt {i + 1}",
                          file=sys.stderr)
                return
            print(f"bench: device probe attempt {i + 1} exited "
                  f"rc={r.returncode}: {r.stderr.strip()[-400:]}",
                  file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"bench: device probe attempt {i + 1} hung >"
                  f"{timeout_s}s (TPU tunnel wedged?), retrying",
                  file=sys.stderr)
        time.sleep(pause_s)
    print("bench: device init failed after "
          f"{len(attempts)} attempts", file=sys.stderr)
    sys.exit(2)


def main():
    _check_devices()
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, REPO_DIR)
    from __graft_entry__ import _loft_model
    from bonai_tpu.engine import (build_optimizer, build_lr_schedule,
                                  create_train_state, make_train_step)
    from bonai_tpu.engine.optim import frozen_mask_from_model

    batch_size = 2
    size = 1024
    g, m = 100, 112

    model, cfg = _loft_model(nms_pre=3000, max_num=3000)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = variables["params"]
    schedule = build_lr_schedule(0.005, 1000, [16, 22], 24,
                                 warmup="linear", warmup_iters=300,
                                 warmup_ratio=0.001)
    frozen = frozen_mask_from_model(params, 1)
    tx = build_optimizer(dict(type="SGD", lr=0.005, momentum=0.9,
                              weight_decay=1e-4), schedule,
                         dict(max_norm=35), frozen)
    state = create_train_state(params, variables.get("batch_stats", {}), tx)
    step = make_train_step(model, tx, mesh=None)

    r = np.random.RandomState(0)
    xy1 = r.uniform(0, size * 0.6, (batch_size, g, 2)).astype(np.float32)
    wh = r.uniform(10, size * 0.2, (batch_size, g, 2)).astype(np.float32)
    batch = {
        "image": jnp.asarray(r.randn(batch_size, size, size, 3),
                             jnp.float32),
        "img_shape": jnp.full((batch_size, 2), float(size)),
        "gt_bboxes": jnp.asarray(
            np.concatenate([xy1, np.minimum(xy1 + wh, size - 1)], -1)),
        "gt_labels": jnp.zeros((batch_size, g), jnp.int32),
        "gt_valid": jnp.ones((batch_size, g), bool),
        "gt_masks": jnp.asarray(
            (r.rand(batch_size, g, m, m) > 0.4).astype(np.uint8)),
        "gt_offsets": jnp.asarray(
            r.uniform(-30, 30, (batch_size, g, 2)), jnp.float32),
    }
    rng = jax.random.PRNGKey(1)

    # warmup/compile
    state, metrics = step(state, batch, rng)
    _ = float(metrics["loss"])

    # Honest timing on the tunneled platform: block_until_ready can
    # signal early, so the clock is closed by fetching real bytes.  But a
    # PER-STEP fetch serialises a host round-trip into every step, so the
    # timed block chains ``iters`` steps on device (each consumes the
    # previous state) and fetches ONCE — the data dependency forces every
    # step to complete before the final loss bytes can arrive.
    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    img_per_sec = batch_size / dt

    print(json.dumps({
        "metric": "loft_foa_train_images_per_sec_per_chip",
        "value": round(img_per_sec, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
