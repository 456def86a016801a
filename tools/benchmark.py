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

    n_iters = max(args.num_images // b, 1)

    # Chain the timed iterations inside ONE program: the tunneled
    # platform adds a large per-dispatch latency, so per-call timing
    # measures the tunnel, not the model (same rationale as bench.py's
    # chained train steps).  The next iteration's image depends on the
    # previous output, so all iterations must really execute.
    def chained(v, i, hs, f):
        def body(_, carry):
            im, acc = carry
            out = model.apply(v, im, hs, f, method="simple_test")
            tie = out["det_scores"].astype(jnp.float32).sum()
            im = im * (1.0 + 0.0 * tie.astype(im.dtype))
            return im, acc + tie
        _, acc = jax.lax.fori_loop(0, n_iters, body, (i, jnp.float32(0)))
        return acc

    run = jax.jit(chained)
    acc = run(variables, img, shp, sf)
    _ = float(acc)                         # warmup + compile
    t0 = time.perf_counter()
    acc = run(variables, img, shp, sf)
    _ = float(acc)                         # fetch closes the clock
    dt = time.perf_counter() - t0
    fps = n_iters * b / dt
    print(f"fps: {fps:.2f} img/s ({dt / n_iters * 1000:.1f} ms/iter, "
          f"batch {b}, {s}x{s}, {n_iters} chained iters)")


if __name__ == "__main__":
    main()
