#!/usr/bin/env python
"""A/B lane for train-step throughput experiments (bench.py protocol,
parameterised).  Not part of the driver surface — bench.py stays the
official metric; this script exists to measure candidate wins (XLA flag
sweeps, batch-size scaling) under the same chained-step timing.

Usage:
  python tools/bench_ab.py --batch 2 --iters 30
  XLA_FLAGS='--xla_tpu_scoped_vmem_limit_kib=65536' python tools/bench_ab.py
"""

import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _loft_model
    from bonai_tpu.engine import (build_optimizer, build_lr_schedule,
                                  create_train_state, make_train_step)
    from bonai_tpu.engine.optim import frozen_mask_from_model

    batch_size, size, g, m = args.batch, args.size, 100, 112
    model, cfg = _loft_model(nms_pre=3000, max_num=3000)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = variables["params"]
    schedule = build_lr_schedule(0.005, 1000, [16, 22], 24, warmup="linear",
                                 warmup_iters=300, warmup_ratio=0.001)
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

    state, metrics = step(state, batch, rng)
    _ = float(metrics["loss"])

    best = None
    for rd in range(args.rounds):
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        _ = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        ips = batch_size / dt
        best = max(best or 0.0, ips)
        print(json.dumps({"round": rd, "ms_per_step": dt * 1e3,
                          "img_per_sec": ips, "batch": batch_size,
                          "xla_flags": os.environ.get("XLA_FLAGS", "")}))
    print(json.dumps({"best_img_per_sec": best, "batch": batch_size}))


if __name__ == "__main__":
    main()
