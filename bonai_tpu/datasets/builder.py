"""Dataset building + the host-side data loader.

reference: ``mmdet/datasets/builder.py:22-144`` (registries, 5-city concat,
dataloader construction with Distributed/Group samplers).  TPU replacement:
a thread-prefetched numpy loader producing fixed-shape padded batches; the
distributed sharding of the reference's ``DistributedGroupSampler`` becomes
a per-host slice of the epoch permutation (``shard_id``/``num_shards``).
Aspect-ratio grouping is degenerate for BONAI's fixed 1024² tiles and is
intentionally dropped.
"""

from __future__ import annotations

import numpy as np

from ..registry import Registry, build_from_cfg

DATASETS = Registry("dataset")


def _register_defaults():
    from .coco import CocoDataset
    from .bonai import BONAI
    from .extra import (CityscapesDataset, DeepFashionDataset,
                        LVISDataset, VOCDataset, WIDERFaceDataset,
                        XMLDataset)
    for cls in (CocoDataset, BONAI, VOCDataset, XMLDataset, LVISDataset,
                CityscapesDataset, WIDERFaceDataset,
                DeepFashionDataset):
        if cls.__name__ not in DATASETS:
            DATASETS.register_module(module=cls)


class ConcatDataset:
    """reference: 5-city multi-ann-file concat (``builder.py:26-55``)."""

    def __init__(self, datasets):
        self.datasets = datasets
        self.cumlens = np.cumsum([len(d) for d in datasets])
        self.CLASSES = datasets[0].CLASSES

    def __len__(self):
        return int(self.cumlens[-1])

    def _locate(self, idx):
        ds = int(np.searchsorted(self.cumlens, idx, side="right"))
        prev = 0 if ds == 0 else int(self.cumlens[ds - 1])
        return self.datasets[ds], idx - prev

    def prepare(self, idx, rng=None):
        d, i = self._locate(idx)
        return d.prepare(i, rng)

    @property
    def test_mode(self):
        return self.datasets[0].test_mode

    def get_ann_info(self, idx):
        d, i = self._locate(idx)
        return d.get_ann_info(i)


class RepeatDataset:
    """Repeat a dataset ``times`` over — amortises epoch-boundary costs for
    small datasets (reference ``dataset_wrappers.py:55-94``)."""

    def __init__(self, dataset, times):
        self.dataset = dataset
        self.times = times
        self.CLASSES = dataset.CLASSES
        self._ori_len = len(dataset)

    def __len__(self):
        return self.times * self._ori_len

    def prepare(self, idx, rng=None):
        return self.dataset.prepare(idx % self._ori_len, rng)

    def get_ann_info(self, idx):
        return self.dataset.get_ann_info(idx % self._ori_len)

    def get_cat_ids(self, idx):
        return self.dataset.get_cat_ids(idx % self._ori_len)

    @property
    def test_mode(self):
        return self.dataset.test_mode


class ClassBalancedDataset:
    """LVIS-style repeat-factor oversampling: image-level repeat factor
    ``r(I) = max_c max(1, sqrt(thr / f(c)))`` over the categories in the
    image (reference ``dataset_wrappers.py:97-198``)."""

    def __init__(self, dataset, oversample_thr):
        import math
        self.dataset = dataset
        self.oversample_thr = oversample_thr
        self.CLASSES = dataset.CLASSES
        n = len(dataset)
        freq = {}
        per_img_cats = []
        for i in range(n):
            cats = set(dataset.get_cat_ids(i))
            per_img_cats.append(cats)
            for c in cats:
                freq[c] = freq.get(c, 0) + 1
        cat_repeat = {c: max(1.0, math.sqrt(oversample_thr / (v / n)))
                      for c, v in freq.items()}
        self.repeat_indices = []
        for i, cats in enumerate(per_img_cats):
            r = max((cat_repeat[c] for c in cats), default=1.0)
            self.repeat_indices.extend([i] * int(math.ceil(r)))

    def __len__(self):
        return len(self.repeat_indices)

    def prepare(self, idx, rng=None):
        return self.dataset.prepare(self.repeat_indices[idx], rng)

    def get_ann_info(self, idx):
        return self.dataset.get_ann_info(self.repeat_indices[idx])

    def get_cat_ids(self, idx):
        return self.dataset.get_cat_ids(self.repeat_indices[idx])

    @property
    def test_mode(self):
        return self.dataset.test_mode


def build_dataset(cfg, default_args=None):
    _register_defaults()
    cfg = dict(cfg)
    if cfg.get("type") == "RepeatDataset":
        return RepeatDataset(build_dataset(cfg["dataset"], default_args),
                             cfg["times"])
    if cfg.get("type") == "ClassBalancedDataset":
        return ClassBalancedDataset(
            build_dataset(cfg["dataset"], default_args),
            cfg["oversample_thr"])
    ann_file = cfg.get("ann_file")
    if isinstance(ann_file, (list, tuple)):
        # per-city prefix plumbing (reference builder.py:26-55): each
        # prefix kind may be a matching list or a shared scalar
        n = len(ann_file)
        kinds = ("img_prefix", "seg_prefix", "edge_prefix",
                 "side_face_prefix", "offset_field_prefix")
        parts = []
        for i, af in enumerate(ann_file):
            sub = dict(cfg)
            sub["ann_file"] = af
            for kind in kinds:
                val = cfg.get(kind)
                if isinstance(val, (list, tuple)):
                    assert len(val) == n, \
                        f"{kind} list must match ann_file list length"
                    sub[kind] = val[i]
            parts.append(build_from_cfg(sub, DATASETS, default_args))
        return ConcatDataset(parts) if len(parts) > 1 else parts[0]
    return build_from_cfg(cfg, DATASETS, default_args)


# ---------------------------------------------------------------------------
# packing to fixed shapes
# ---------------------------------------------------------------------------

def rasterize_instance_mask(polys, bbox, size):
    """Rasterise a multi-part polygon into a bbox-local (size, size) grid."""
    import cv2
    x1, y1, x2, y2 = bbox
    w = max(x2 - x1, 1e-3)
    h = max(y2 - y1, 1e-3)
    mask = np.zeros((size, size), np.uint8)
    pts = []
    for p in polys:
        q = np.empty_like(p)
        q[:, 0] = (p[:, 0] - x1) / w * size
        q[:, 1] = (p[:, 1] - y1) / h * size
        if q.shape[0] >= 3:
            pts.append(np.round(q).astype(np.int32))
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


def pack_sample(result, max_gt, inst_mask_size, train=True):
    """Pipeline output -> fixed-shape numpy sample (model batch contract).

    Deferred (device-side) normalisation keeps the image uint8 here — it
    crosses the tunnel 4x smaller and the compiled step normalises it.
    """
    img = result["img"]
    dt = np.uint8 if img.dtype == np.uint8 else np.float32
    img = np.ascontiguousarray(img, dt)
    h, w = result["img_shape"][:2]
    sf = result.get("scale_factor", 1.0)
    sf = float(np.asarray(sf).reshape(-1)[0])
    out = {
        "image": img,
        "img_shape": np.asarray([h, w], np.float32),
        "scale_factor": np.float32(sf),
    }
    if not train:
        return out, result.get("img_metas", {})
    boxes = result.get("gt_bboxes", np.zeros((0, 4), np.float32))
    labels = result.get("gt_labels", np.zeros((0,), np.int64))
    offsets = result.get("gt_offsets", np.zeros((len(boxes), 2), np.float32))
    polys = result.get("gt_masks", [[] for _ in range(len(boxes))])
    n = min(len(boxes), max_gt)
    n_truncated = len(boxes) - n  # surfaced via img_metas + loader counter
    gt_bboxes = np.zeros((max_gt, 4), np.float32)
    gt_labels = np.zeros((max_gt,), np.int32)
    gt_valid = np.zeros((max_gt,), bool)
    gt_offsets = np.zeros((max_gt, 2), np.float32)
    gt_masks = np.zeros((max_gt, inst_mask_size, inst_mask_size), np.uint8)
    gt_bboxes[:n] = boxes[:n]
    gt_labels[:n] = labels[:n]
    gt_valid[:n] = True
    gt_offsets[:n] = offsets[:n]
    for i in range(n):
        if polys[i]:
            gt_masks[i] = rasterize_instance_mask(
                polys[i], boxes[i], inst_mask_size)
    out.update(gt_bboxes=gt_bboxes, gt_labels=gt_labels, gt_valid=gt_valid,
               gt_offsets=gt_offsets, gt_masks=gt_masks)
    if "gt_footprint_bboxes" in result:
        fp = np.zeros((max_gt, 4), np.float32)
        fb = result["gt_footprint_bboxes"]
        k = min(len(fb), max_gt)
        fp[:k] = fb[:k]
        out["gt_footprint_bboxes"] = fp
    if "gt_only_footprint_flag" in result:
        out["gt_only_footprint_flag"] = np.float32(
            result["gt_only_footprint_flag"])
    if "gt_building_heights" in result:
        gh = np.zeros((max_gt,), np.float32)
        hv = np.asarray(result["gt_building_heights"],
                        np.float32).reshape(-1)
        gh[:min(len(hv), max_gt)] = hv[:max_gt]
        out["gt_building_heights"] = gh
    if "gt_angle" in result:
        out["gt_angle"] = np.float32(result["gt_angle"])
    if "proposals" in result:
        # Fast R-CNN external proposals (reference loading.py:586-625 +
        # two_stage.py forward_train proposals kwarg), padded static
        cap = int(result.get("_num_max_proposals", 2000))
        props = np.asarray(result["proposals"], np.float32).reshape(-1, 4)
        pp = np.zeros((cap, 4), np.float32)
        pv = np.zeros((cap,), bool)
        k = min(len(props), cap)
        pp[:k] = props[:k]
        pv[:k] = True
        out["proposals"] = pp
        out["proposals_valid"] = pv
    # dense per-pixel supervision maps ride along at image resolution
    # (already resized/padded to the image canvas by the pipeline)
    for key in ("gt_offset_field", "gt_edge_maps", "gt_side_face_maps"):
        if key in result:
            out[key] = np.asarray(result[key], np.float32)
    metas = dict(result.get("img_metas", {}))
    if n_truncated:
        # dropped GT becomes false "background" for the RPN/RCNN losses;
        # never drop silently (the reference has no cap at all,
        # mmdet/datasets/bonai.py:105-256)
        metas["gt_truncated"] = n_truncated
    return out, metas


_POOL_STATE = {}


def _pool_init(dataset, batch_size, max_gt, inst_mask_size, train):
    """Process-pool worker initialiser (fork start method: the dataset
    index arrives via copy-on-write, not pickling)."""
    _POOL_STATE.update(dataset=dataset, batch_size=batch_size,
                       max_gt=max_gt, inst_mask_size=inst_mask_size,
                       train=train)


def _pool_make_batch(args):
    """Build one packed batch inside a worker process."""
    idx_list, seed = args
    st = _POOL_STATE
    rng = np.random.RandomState(seed)
    samples, metas = [], []
    for idx in idx_list:
        for _ in range(32):
            res = st["dataset"].prepare(int(idx), rng)
            if res is not None:
                s, m = pack_sample(res, st["max_gt"],
                                   st["inst_mask_size"], st["train"])
                break
            idx = rng.randint(len(st["dataset"]))
        else:
            raise RuntimeError("too many empty samples")
        samples.append(s)
        metas.append(m)
    batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    return batch, metas


class DataLoader:
    """Prefetched fixed-shape batch iterator.

    ``mode='thread'`` (default): a ThreadPoolExecutor overlaps decode/
    augment with the device step (cv2 releases the GIL for the decode).
    ``mode='process'``: a fork-based ProcessPoolExecutor sidesteps the
    GIL entirely — the reference's worker-process model
    (``mmdet/datasets/builder.py:77-144``) for hosts where the python
    augment/pack stage, not the decode, is the bottleneck.
    """

    def __init__(self, dataset, batch_size, max_gt=256, inst_mask_size=112,
                 shuffle=True, seed=0, train=True, drop_last=None,
                 shard_id=0, num_shards=1, prefetch=2, mode="thread"):
        self.mode = mode
        self._pool = None
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_gt = max_gt
        self.inst_mask_size = inst_mask_size
        self.shuffle = shuffle
        self.seed = seed
        self.train = train
        self.drop_last = train if drop_last is None else drop_last
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.prefetch = prefetch
        self.epoch = 0
        # running truncation telemetry (weak-spot guard: max_gt must not
        # silently drop dense-tile ground truth)
        self.truncated_instances = 0
        self.truncated_samples = 0

    def __len__(self):
        if self.drop_last:
            return (len(self.dataset) // self.num_shards) // self.batch_size
        per = -(-len(self.dataset) // self.num_shards)
        return -(-per // self.batch_size)

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _epoch_indices(self):
        n = len(self.dataset)
        rng = np.random.RandomState(self.seed + self.epoch)
        idx = rng.permutation(n) if self.shuffle else np.arange(n)
        if self.num_shards == 1:
            return idx
        if self.drop_last:
            # training: contiguous equal shards, tail dropped (reference
            # DistributedGroupSampler semantics)
            per = n // self.num_shards
            return idx[self.shard_id * per:(self.shard_id + 1) * per]
        # eval: wrap-pad so every shard sees ceil(n/shards) images, then
        # interleave — shard s gets padded[s::shards], so the global order
        # is recovered by merged[j*shards + s] = host_s[j] and truncating
        # to n (reference collect_results interleave-unshard,
        # apis/test.py:145-184)
        per = -(-n // self.num_shards)
        padded = np.resize(idx, per * self.num_shards)  # cyclic wrap-pad
        return padded[self.shard_id::self.num_shards]

    def _load_one(self, idx, rng):
        for attempt in range(32):
            res = self.dataset.prepare(int(idx), rng)
            if res is not None:
                return pack_sample(res, self.max_gt, self.inst_mask_size,
                                   self.train)
            # reference _rand_another retry on empty-GT samples
            idx = rng.randint(len(self.dataset))
        raise RuntimeError("too many empty samples")

    def _process_pool(self):
        if self._pool is None:
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor
            ctx = mp.get_context("fork")
            self._pool = ProcessPoolExecutor(
                max_workers=self.prefetch, mp_context=ctx,
                initializer=_pool_init,
                initargs=(self.dataset, self.batch_size, self.max_gt,
                          self.inst_mask_size, self.train))
        return self._pool

    def _iter_process(self):
        indices = self._epoch_indices()
        nb = len(self)
        base_seed = (self.seed + self.epoch) * 9973 + self.shard_id
        ex = self._process_pool()

        def batch_args(bi):
            ks = [int(indices[(bi * self.batch_size + j)
                              % max(len(indices), 1)])
                  for j in range(self.batch_size)]
            return ks, base_seed + bi

        futures = [ex.submit(_pool_make_batch, batch_args(i))
                   for i in range(min(self.prefetch, nb))]
        nxt = len(futures)
        for i in range(nb):
            batch, metas = futures[i % self.prefetch].result()
            if nxt < nb:
                futures[nxt % self.prefetch] = ex.submit(
                    _pool_make_batch, batch_args(nxt))
                nxt += 1
            for m in metas:
                if m.get("gt_truncated"):
                    self.truncated_instances += m["gt_truncated"]
                    self.truncated_samples += 1
            yield batch, metas

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor
        if self.mode == "process":
            yield from self._iter_process()
            return
        indices = self._epoch_indices()
        nb = len(self)
        rng = np.random.RandomState(
            (self.seed + self.epoch) * 9973 + self.shard_id)

        def make_batch(bi):
            samples = []
            metas = []
            for j in range(self.batch_size):
                k = bi * self.batch_size + j
                if k >= len(indices):
                    k = k % max(len(indices), 1)
                s, m = self._load_one(indices[k], rng)
                if m.get("gt_truncated"):
                    self.truncated_instances += m["gt_truncated"]
                    self.truncated_samples += 1
                samples.append(s)
                metas.append(m)
            batch = {k: np.stack([s[k] for s in samples])
                     for k in samples[0]}
            return batch, metas

        with ThreadPoolExecutor(max_workers=self.prefetch) as ex:
            futures = [ex.submit(make_batch, i)
                       for i in range(min(self.prefetch, nb))]
            nxt = len(futures)
            for i in range(nb):
                batch = futures[i % self.prefetch].result()
                if nxt < nb:
                    futures[nxt % self.prefetch] = ex.submit(make_batch, nxt)
                    nxt += 1
                yield batch


def build_dataloader(dataset, samples_per_gpu, workers_per_gpu=2,
                     num_devices=1, shuffle=True, seed=0, max_gt=256,
                     inst_mask_size=112, train=True, shard_id=0,
                     num_shards=1, loader_mode="thread", **kwargs):
    """reference: ``mmdet/datasets/builder.py:77-144``.  The global batch is
    ``samples_per_gpu * num_devices`` (DDP parity: per-device batch stays
    ``samples_per_gpu``).  ``loader_mode='process'`` selects the
    fork-based worker-process pool (reference DataLoader worker model)."""
    return DataLoader(dataset, batch_size=samples_per_gpu * num_devices,
                      max_gt=max_gt, inst_mask_size=inst_mask_size,
                      shuffle=shuffle, seed=seed, train=train,
                      shard_id=shard_id, num_shards=num_shards,
                      prefetch=max(2, workers_per_gpu), mode=loader_mode)
