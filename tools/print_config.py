#!/usr/bin/env python
"""Print a fully-merged config (reference: ``tools/print_config.py``)."""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from bonai_tpu import Config


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--options", nargs="+", default=None)
    args = parser.parse_args()
    cfg = Config.fromfile(args.config)
    if args.options:
        from tools.train import parse_options
        cfg.merge_from_dict(parse_options(args.options))
    print(f"Config path: {cfg.filename}\n")
    print(cfg.pretty_text)


if __name__ == "__main__":
    main()
