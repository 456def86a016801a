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

Also times the full inference/test path (RPN soft-NMS eval cfg + bbox/
mask/FOA offset heads + multiclass NMS) on the same shapes, against the
reference Mask R-CNN V100 yardstick of 19.6 fps
(reference docs/model_zoo.md:211-221, tools/benchmark.py:62-93).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline",
"infer_metric", "infer_value", "infer_unit", "infer_vs_baseline"}.
"""

import json
import os
import sys
import threading
import time

import numpy as np

BASELINE_IMG_PER_SEC = 3.5
BASELINE_INFER_FPS = 19.6
REPO_DIR = os.path.dirname(os.path.abspath(__file__))

# Wedge-recovery protocol (see .claude/skills/verify/SKILL.md): the tunneled
# TPU claim wedges when a TPU-attached process is KILLED mid-claim, and every
# additional killed short-timeout probe re-wedges it.  So this bench never
# spawns throwaway probe subprocesses.  Instead:
#   1. wait (without killing anything) for other live python processes that
#      might hold the claim to exit;
#   2. if a previous bench invocation recorded a wedge, let the tunnel sit
#      untouched until >=8 minutes have passed since that marker;
#   3. make ONE long-lived in-process init attempt with a generous internal
#      deadline (watchdog thread, 900 s).  On timeout, record the wedge
#      marker so the NEXT invocation waits out the claim, then exit 2 —
#      a second driver invocation of bench.py is then expected to succeed.
WEDGE_MARKER = "/tmp/bonai_bench_wedge_marker"
INIT_DEADLINE_S = 900
WEDGE_SETTLE_S = 480


def _other_python_pids():
    """PIDs of other live python processes (candidate TPU claim holders).

    Excludes ourselves and our ancestors (the driver shell chain)."""
    me = os.getpid()
    ancestors = set()
    pid = me
    for _ in range(32):
        try:
            with open(f"/proc/{pid}/stat") as f:
                pid = int(f.read().split(")")[-1].split()[1])
        except (OSError, ValueError, IndexError):
            break
        if pid <= 1:
            break
        ancestors.add(pid)
    out = []
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        pid = int(entry)
        if pid == me or pid in ancestors:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
        except OSError:
            continue
        # .tpu_init.py is the tunnel relay daemon itself — a permanent
        # fixture, not a claim-holding jax client.  Never wait on (or
        # signal!) it.
        if ("python" in cmd and "bench.py" not in cmd
                and ".tpu_init" not in cmd):
            out.append((pid, cmd.strip()[:120]))
    return out


def _wait_for_quiet_tunnel(max_wait_s=600):
    """Phase 1+2 of the protocol: wait for other python processes to exit
    (never kill them) and honour a recorded wedge settle period."""
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        others = _other_python_pids()
        if not others:
            break
        print(f"bench: waiting for {len(others)} other python process(es) "
              f"to release the TPU claim: {others[:3]}", file=sys.stderr)
        time.sleep(20)
    try:
        wedge_age = time.time() - os.path.getmtime(WEDGE_MARKER)
    except OSError:
        return
    if wedge_age < WEDGE_SETTLE_S:
        settle = WEDGE_SETTLE_S - wedge_age
        print(f"bench: previous invocation recorded a wedged tunnel "
              f"{wedge_age:.0f}s ago; settling {settle:.0f}s before the "
              "single init attempt", file=sys.stderr)
        time.sleep(settle)


def _check_devices():
    """ONE long-lived init attempt with an internal deadline.  The watchdog
    only fires if the claim truly hangs; it records the wedge marker so the
    next invocation waits the settle period, then force-exits (nothing else
    can unwind a hung RPC in the jax runtime).  No throwaway probe
    subprocesses: killed probes are what re-wedge the tunnel."""
    _wait_for_quiet_tunnel()
    done = threading.Event()

    def watchdog():
        if done.wait(INIT_DEADLINE_S):
            return
        with open(WEDGE_MARKER, "w") as f:
            f.write(str(time.time()))
        print(f"bench: device init exceeded {INIT_DEADLINE_S}s "
              "(TPU tunnel wedged); marker recorded — rerun bench.py "
              "after the claim expires", file=sys.stderr)
        sys.stderr.flush()
        os._exit(2)

    threading.Thread(target=watchdog, daemon=True).start()
    import jax
    devices = jax.devices()
    done.set()
    try:
        os.unlink(WEDGE_MARKER)
    except OSError:
        pass
    print(f"bench: devices: {[str(d) for d in devices]}", file=sys.stderr)


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

    # ---- inference throughput (full test path: soft-NMS proposals, bbox
    # decode + multiclass NMS, mask + FOA offset heads).  Chained
    # iterations (next input depends on previous output) so the tunnel's
    # per-dispatch latency is amortised but every iteration really runs.
    infer_variables = {"params": state.params}
    if state.batch_stats:
        infer_variables["batch_stats"] = state.batch_stats
    img = batch["image"]
    shp = batch["img_shape"]
    sf = jnp.ones((batch_size,))
    infer_iters = 30

    def chained_infer(v, im):
        def body(_, carry):
            im, acc = carry
            out = model.apply(v, im, shp, sf, method="simple_test")
            tie = out["det_scores"].astype(jnp.float32).sum()
            im = im * (1.0 + 0.0 * tie.astype(im.dtype))
            return im, acc + tie
        _, acc = jax.lax.fori_loop(0, infer_iters, body,
                                   (im, jnp.float32(0)))
        return acc

    run_infer = jax.jit(chained_infer)
    _ = float(run_infer(infer_variables, img))      # warmup + compile
    t0 = time.perf_counter()
    _ = float(run_infer(infer_variables, img))      # fetch closes the clock
    infer_dt = (time.perf_counter() - t0) / infer_iters
    infer_img_per_sec = batch_size / infer_dt

    print(json.dumps({
        "metric": "loft_foa_train_images_per_sec_per_chip",
        "value": round(img_per_sec, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
        "infer_metric": "loft_foa_infer_images_per_sec_per_chip",
        "infer_value": round(infer_img_per_sec, 3),
        "infer_unit": "img/s/chip",
        "infer_vs_baseline": round(infer_img_per_sec / BASELINE_INFER_FPS,
                                   3),
    }))


if __name__ == "__main__":
    main()
