#!/usr/bin/env python
"""Micro-benchmark the RoIAlign implementations on the production shapes.

Shapes mirror the LOFT train step at 1024x1024, batch 2 (reference
``single_level_roi_extractor.py:54-93`` is the CUDA counterpart):
  bbox branch:   R=2048 rois, out 7x7,  sr=2
  mask branch:   R=512  rois, out 14x14, sr=2
  offset branch: R=512  rois, out 7x7,  sr=2

For each impl prints fwd / bwd / fwd+bwd ms per call (timed by fetching
result bytes — block_until_ready on the tunneled platform can return
early).
"""

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def timed(fn, *args, iters=20):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][0]).sum()
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0][0]).sum()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--size", type=int, default=1024)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--impls", default="gather,blocked,pallas,fused")
    args = parser.parse_args()

    global jax
    import jax
    import jax.numpy as jnp
    from bonai_tpu.ops.roi_align import (multilevel_roi_align,
                                         prepare_flat_levels)
    from bonai_tpu.ops.roi_align_blocked import multilevel_roi_align_blocked

    B, S = args.batch, args.size
    C = 256
    strides = [4, 8, 16, 32]
    dt = jnp.dtype(args.dtype)
    r = np.random.RandomState(0)
    feats = [jnp.asarray(r.randn(B, S // s, S // s, C), dt) for s in strides]

    def rois_of(n, lo=32, hi=448):
        xy1 = r.uniform(0, S - hi, (n, 2)).astype(np.float32)
        wh = r.uniform(lo, hi, (n, 2)).astype(np.float32)
        b = r.randint(0, B, (n, 1)).astype(np.float32)
        return jnp.asarray(np.concatenate([b, xy1, xy1 + wh], -1))

    branches = [("bbox", rois_of(2048), 7),
                ("mask", rois_of(512), 14),
                ("offset", rois_of(512), 7)]

    impls = {}
    if "gather" in args.impls:
        impls["gather"] = multilevel_roi_align
    if "blocked" in args.impls:
        impls["blocked"] = multilevel_roi_align_blocked
    if "pallas" in args.impls:
        from bonai_tpu.ops.pallas_roi_align import pallas_roi_align

        def pallas_impl(f, ro, os_, st, sampling_ratio=2, flat_pack=None):
            return pallas_roi_align(f, ro, os_, st,
                                    sampling_ratio=sampling_ratio)
        impls["pallas"] = pallas_impl
    if "fused" in args.impls:
        from bonai_tpu.ops.pallas_roi_align_fused import (
            pallas_multilevel_roi_align)
        impls["fused"] = pallas_multilevel_roi_align

    for name, fn in impls.items():
        for bname, rois, osz in branches:
            def fwd(fs, ro):
                return fn(fs, ro, osz, strides, sampling_ratio=2)

            def loss(fs, ro):
                return jnp.sum(fwd(fs, ro).astype(jnp.float32) ** 2)

            jf = jax.jit(fwd)
            try:
                tf = timed(jf, feats, rois, iters=args.iters)
            except Exception as e:  # noqa: BLE001
                print(f"{name:8s} {bname:7s} fwd FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}")
                continue
            line = f"{name:8s} {bname:7s} fwd {tf:8.3f} ms"
            try:
                jg = jax.jit(jax.grad(loss))
                tg = timed(jg, feats, rois, iters=args.iters)
                line += f"   fwd+bwd {tg:8.3f} ms"
            except Exception as e:  # noqa: BLE001
                line += f"   bwd FAILED: {type(e).__name__}: {str(e)[:160]}"
            print(line, flush=True)


if __name__ == "__main__":
    main()
