#!/usr/bin/env python
"""Training CLI (reference: ``tools/train.py:25-160``).

Usage: python tools/train.py CONFIG [--work-dir DIR] [--seed N]
       [--resume-from CKPT] [--options k=v ...]
"""

import argparse
import logging
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from bonai_tpu import Config
from bonai_tpu.apis import train_detector


def parse_options(pairs):
    out = {}
    for p in pairs or []:
        k, v = p.split("=", 1)
        try:
            import ast
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def main():
    parser = argparse.ArgumentParser(description="Train a detector")
    parser.add_argument("config")
    parser.add_argument("--work-dir", default=None)
    parser.add_argument("--resume-from", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--n-devices", type=int, default=None)
    parser.add_argument("--deterministic", action="store_true")
    parser.add_argument("--options", nargs="+", default=None,
                        help="config overrides k=v (dotted keys)")
    args = parser.parse_args()

    cfg = Config.fromfile(args.config)
    if args.options:
        cfg.merge_from_dict(parse_options(args.options))
    work_dir = args.work_dir or osp.join(
        "work_dirs", osp.splitext(osp.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    cfg.dump(osp.join(work_dir, osp.basename(args.config)))

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    logger = logging.getLogger("bonai_tpu")
    fh = logging.FileHandler(osp.join(
        work_dir, time.strftime("%Y%m%d_%H%M%S") + ".log"))
    logger.addHandler(fh)
    import jax
    logger.info("jax %s devices=%s", jax.__version__, jax.devices())
    logger.info("Config:\n%s", cfg.pretty_text)

    train_detector(cfg, work_dir, seed=args.seed,
                   resume_from=args.resume_from, max_steps=args.max_steps,
                   n_devices=args.n_devices)


if __name__ == "__main__":
    main()
