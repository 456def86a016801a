#!/usr/bin/env python
"""Microbenchmark the Pallas RoIAlign kernel at the production branch
shapes (bbox: 2048 RoIs @ 7x7, mask: 512 @ 14x14, offset: 512 @ 7x7 on
the 1024^2 R50-FPN pyramid) to guide kernel tuning — isolates the kernel
from the full train step so tuning iterations compile in seconds."""

import argparse
import sys
import os.path as osp
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chains", type=int, default=2)
    p.add_argument("--window", type=int, default=40)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--impl", default="pallas",
                   choices=["pallas", "gather", "block"])
    p.add_argument("--branch", default="all",
                   choices=["all", "bbox", "mask", "offset"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    print("devices:", jax.devices(), file=sys.stderr)

    B, C, size = 2, 256, 1024
    strides = [4, 8, 16, 32]
    feats = [jnp.asarray(np.random.RandomState(l).randn(
        B, size // s, size // s, C), jnp.bfloat16)
        for l, s in enumerate(strides)]

    branches = dict(
        bbox=(2048, 7),
        mask=(512, 14),
        offset=(512, 7),
    )
    if args.branch != "all":
        branches = {args.branch: branches[args.branch]}

    r = np.random.RandomState(0)

    def make_rois(n):
        # building-like size mix (matches the BONAI proposal distribution:
        # mostly sqrt(wh) < 112 -> levels 0-1, a small large-box tail)
        xy1 = r.uniform(0, size * 0.7, (n, 2))
        wh = np.where(r.rand(n, 2) < 0.9,
                      r.uniform(10, 120, (n, 2)),
                      r.uniform(120, 300, (n, 2)))
        b = r.randint(0, B, (n, 1))
        return jnp.asarray(np.concatenate(
            [b, xy1, np.minimum(xy1 + wh, size - 1)], 1), jnp.float32)

    rois = {k: make_rois(n) for k, (n, _) in branches.items()}

    if args.impl == "pallas":
        from bonai_tpu.ops.pallas_roi_align_fused import (
            pallas_multilevel_roi_align as fn)
        kw = dict(window=args.window, chains=args.chains)
    elif args.impl == "block":
        from bonai_tpu.ops.pallas_roi_align_block import (
            pallas_block_roi_align as fn)
        kw = dict(window=args.window, chains=args.chains)
    else:
        from bonai_tpu.ops.roi_align import multilevel_roi_align as fn
        kw = {}

    def run(feats):
        loss = jnp.float32(0)
        for k, (n, out) in branches.items():
            pooled = fn(feats, rois[k], out, strides, sampling_ratio=2,
                        **kw)
            loss = loss + jnp.sum(pooled.astype(jnp.float32) ** 2)
        return loss

    # Device-chained timing: each iteration's input depends on the
    # previous output, so all iterations really execute, and ONE final
    # fetch closes the clock — the ~20 ms/iter tunnel round trip of a
    # per-iteration fetch would otherwise swamp kernel-level deltas.
    iters = args.iters

    def chained(step_fn):
        def body(_, carry):
            fs, acc = carry
            v = step_fn(fs)
            fs = [f * (1.0 + 0.0 * v.astype(f.dtype)) for f in fs]
            return fs, acc + v
        def outer(fs):
            _, acc = jax.lax.fori_loop(0, iters, body, (fs, jnp.float32(0)))
            return acc
        return jax.jit(outer)

    fwd = chained(run)
    grad_one = lambda fs: jnp.sum(jax.grad(run)(fs)[0].astype(jnp.float32))
    full = chained(grad_one)

    _ = float(fwd(feats))          # warmup + compile
    _ = float(full(feats))
    t0 = time.perf_counter()
    _ = float(fwd(feats))
    t_fwd = (time.perf_counter() - t0) / iters * 1000
    t0 = time.perf_counter()
    _ = float(full(feats))
    t_full = (time.perf_counter() - t0) / iters * 1000

    print(f"impl={args.impl} chains={args.chains} window={args.window} "
          f"branches={list(branches)}: fwd {t_fwd:.2f} ms, "
          f"fwd+bwd {t_full:.2f} ms (bwd ~{t_full - t_fwd:.2f} ms)")


if __name__ == "__main__":
    main()
