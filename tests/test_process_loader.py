"""Process-pool dataloader (reference worker-process model,
``mmdet/datasets/builder.py:77-144``): same batch shapes/count as the
thread loader, GIL-free workers via fork."""

import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from helpers import make_bonai_dataset, TRAIN_PIPELINE


def _dataset(tmp_path):
    from bonai_tpu.datasets import build_dataset
    json_path, img_dir = make_bonai_dataset(str(tmp_path), num_images=6,
                                            size=96, buildings_per_img=3)
    pipeline = [dict(t) for t in TRAIN_PIPELINE]
    pipeline[2] = dict(type="Resize", img_scale=(96, 96), keep_ratio=True)
    return build_dataset(dict(type="BONAI", ann_file=json_path,
                              img_prefix=img_dir, bbox_type="building",
                              mask_type="roof", pipeline=pipeline))


def test_process_loader_matches_thread_loader_shapes(tmp_path):
    from bonai_tpu.datasets import build_dataloader
    ds = _dataset(tmp_path)
    kw = dict(samples_per_gpu=2, workers_per_gpu=2, num_devices=1,
              seed=0, max_gt=8, inst_mask_size=32)
    thread_batches = list(build_dataloader(ds, **kw))
    proc_batches = list(build_dataloader(ds, loader_mode="process", **kw))
    assert len(proc_batches) == len(thread_batches) == 3
    tb, _ = thread_batches[0]
    pb, pm = proc_batches[0]
    assert set(tb) == set(pb)
    for k in tb:
        assert tb[k].shape == pb[k].shape, k
        assert tb[k].dtype == pb[k].dtype, k
    assert len(pm) == 2 and "img_shape" in pm[0]
    # same epoch index order: the unaugmented pixel sets match even though
    # per-sample augmentation rng streams differ between worker models
    assert abs(float(tb["image"].mean()) - float(pb["image"].mean())) < 30


def test_process_loader_multiple_epochs(tmp_path):
    from bonai_tpu.datasets import build_dataloader
    ds = _dataset(tmp_path)
    loader = build_dataloader(ds, samples_per_gpu=2, workers_per_gpu=2,
                              num_devices=1, seed=0, max_gt=8,
                              inst_mask_size=32, loader_mode="process")
    seen = 0
    for ep in range(2):
        loader.set_epoch(ep)
        for batch, _ in loader:
            assert np.isfinite(batch["gt_bboxes"]).all()
            seen += batch["image"].shape[0]
    assert seen == 12
