#!/usr/bin/env python
"""Pure-model inference FPS benchmark (reference: ``tools/benchmark.py:
62-93`` — 2000 images, 5 warmup, device-synchronised timing)."""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from bonai_tpu import Config


def main():
    parser = argparse.ArgumentParser(description="Benchmark a detector")
    parser.add_argument("config")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--num-images", type=int, default=200)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--size", type=int, default=1024)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from bonai_tpu.models import build_detector

    cfg = Config.fromfile(args.config)
    model = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg,
                           compute_dtype=cfg.get("compute_dtype",
                                                 "bfloat16"))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    b, s = args.batch_size, args.size
    img = jnp.asarray(np.random.randn(b, s, s, 3), jnp.float32)
    shp = jnp.full((b, 2), float(s))
    sf = jnp.ones((b,))

    step = jax.jit(lambda v, i, hs, f: model.apply(
        v, i, hs, f, method="simple_test"))
    for _ in range(args.warmup):
        out = step(variables, img, shp, sf)
    jax.block_until_ready(out["det_bboxes"])

    n_iters = max(args.num_images // b, 1)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = step(variables, img, shp, sf)
    jax.block_until_ready(out["det_bboxes"])
    dt = time.perf_counter() - t0
    fps = n_iters * b / dt
    print(f"fps: {fps:.2f} img/s ({dt / n_iters * 1000:.1f} ms/iter, "
          f"batch {b}, {s}x{s})")


if __name__ == "__main__":
    main()
