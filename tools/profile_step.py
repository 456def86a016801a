#!/usr/bin/env python
"""Profile one train step: capture a jax.profiler trace and print the
top device ops by total duration (reference analog:
``mmdet/utils/profiling.py`` + nvprof workflows)."""

import argparse
import glob
import gzip
import os.path as osp
import sys
from collections import defaultdict

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def parse_xplane(path, top=40):
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    with open(path, "rb") as f:
        data = f.read()
    space = xplane_pb2.XSpace()
    space.ParseFromString(data)
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        metas = {m.id: m.name for m in plane.event_metadata.values()} if \
            isinstance(plane.event_metadata, dict) else {
                k: v.name for k, v in plane.event_metadata.items()}
        durs = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = metas.get(ev.metadata_id, str(ev.metadata_id))
                durs[name] += ev.duration_ps / 1e9   # ms
                counts[name] += 1
        if not durs:
            continue
        total = sum(durs.values())
        print(f"\n=== plane: {plane.name} (total {total:.1f} ms of op time,"
              f" possibly overlapping lines) ===")
        for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{d:10.2f} ms  x{counts[name]:<5d} {name[:120]}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=1024)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--logdir", default="/tmp/bonai_profile")
    parser.add_argument("--parse-only", default=None)
    parser.add_argument("--mode", default="train", choices=["train", "infer"])
    args = parser.parse_args()

    if args.parse_only:
        parse_xplane(args.parse_only)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np
    from __graft_entry__ import _loft_model
    from bonai_tpu.engine import (build_optimizer, build_lr_schedule,
                                  create_train_state, make_train_step)
    from bonai_tpu.engine.optim import frozen_mask_from_model

    model, cfg = _loft_model(nms_pre=3000, max_num=3000)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    sch = build_lr_schedule(0.005, 1000, [16, 22], 24, warmup="linear",
                            warmup_iters=300, warmup_ratio=0.001)
    frozen = frozen_mask_from_model(variables["params"], 1)
    tx = build_optimizer(dict(type="SGD", lr=0.005, momentum=0.9,
                              weight_decay=1e-4), sch, dict(max_norm=35),
                         frozen)
    state = create_train_state(variables["params"],
                               variables.get("batch_stats", {}), tx)
    step = make_train_step(model, tx, mesh=None, donate=False)

    b, size, g, m = args.batch, args.size, 100, 112
    r = np.random.RandomState(0)
    xy1 = r.uniform(0, size * 0.6, (b, g, 2)).astype(np.float32)
    wh = r.uniform(10, size * 0.2, (b, g, 2)).astype(np.float32)
    batch = {"image": jnp.asarray(r.randn(b, size, size, 3), jnp.float32),
             "img_shape": jnp.full((b, 2), float(size)),
             "gt_bboxes": jnp.asarray(
                 np.concatenate([xy1, np.minimum(xy1 + wh, size - 1)], -1)),
             "gt_labels": jnp.zeros((b, g), jnp.int32),
             "gt_valid": jnp.ones((b, g), bool),
             "gt_masks": jnp.asarray((r.rand(b, g, m, m) > 0.4),
                                     jnp.bfloat16),
             "gt_offsets": jnp.asarray(r.uniform(-30, 30, (b, g, 2)),
                                       jnp.float32)}
    rng = jax.random.PRNGKey(1)
    if args.mode == "train":
        run = lambda i: step(state, batch, jax.random.fold_in(rng, i))[1]
    else:
        ev = jax.jit(lambda v, i, s, f: model.apply(
            v, i, s, f, method="simple_test"))
        run = lambda i: ev(variables, batch["image"], batch["img_shape"],
                           jnp.ones((b,)))
    out = run(0)
    jax.block_until_ready(out)
    import time
    t0 = time.perf_counter()
    n = 5
    for i in range(n):
        out = run(1 + i)
        # fetch real bytes: axon signals readiness early on block_until_ready
        _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    print(f"steady step: {(time.perf_counter() - t0) * 1000 / n:.1f} ms")

    jax.profiler.start_trace(args.logdir)
    out = run(2)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    pbs = sorted(glob.glob(osp.join(args.logdir, "**", "*.xplane.pb"),
                           recursive=True))
    if pbs:
        parse_xplane(pbs[-1])
    else:
        print("no xplane found in", args.logdir)


if __name__ == "__main__":
    main()
