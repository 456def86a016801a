#!/usr/bin/env python
"""Analyze train_log.jsonl curves (reference: ``tools/analyze_logs.py``)."""

import argparse
import json


def load(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def main():
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="task", required=True)
    p1 = sub.add_parser("plot_curve")
    p1.add_argument("json_logs", nargs="+")
    p1.add_argument("--keys", nargs="+", default=["loss"])
    p1.add_argument("--out", default="curve.png")
    p2 = sub.add_parser("cal_train_time")
    p2.add_argument("json_logs", nargs="+")
    args = parser.parse_args()

    if args.task == "cal_train_time":
        for path in args.json_logs:
            recs = [r for r in load(path) if "time" in r]
            if not recs:
                print(f"{path}: no records")
                continue
            times = [r["time"] for r in recs]
            print(f"{path}: avg {sum(times)/len(times):.4f}s/iter "
                  f"(n={len(times)}, fastest {min(times):.4f}, "
                  f"slowest {max(times):.4f})")
    else:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        for path in args.json_logs:
            recs = load(path)
            for key in args.keys:
                xs = [r["iter"] for r in recs if key in r]
                ys = [r[key] for r in recs if key in r]
                plt.plot(xs, ys, label=f"{path}:{key}")
        plt.xlabel("iter")
        plt.legend()
        plt.savefig(args.out)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
