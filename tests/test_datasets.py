import numpy as np
import pytest

from bonai_tpu.datasets import BONAI, build_dataset, build_dataloader
from bonai_tpu.datasets import mask_utils
from bonai_tpu.datasets.builder import pack_sample

from helpers import make_bonai_dataset, TRAIN_PIPELINE


@pytest.fixture(scope="module")
def bonai_ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bonai"))
    json_path, img_dir = make_bonai_dataset(root)
    ds = BONAI(ann_file=json_path, pipeline=TRAIN_PIPELINE,
               img_prefix=img_dir, bbox_type="building", mask_type="roof")
    return ds


def test_bonai_parse_ann(bonai_ds):
    ann = bonai_ds.get_ann_info(0)
    assert ann["bboxes"].shape[1] == 4
    assert len(ann["masks"]) == len(ann["bboxes"])
    assert ann["offsets"].shape == (len(ann["bboxes"]), 2)
    # building bbox must contain the roof polygon
    roof = np.asarray(ann["masks"][0][0]).reshape(-1, 2)
    bb = ann["bboxes"][0]
    assert roof[:, 0].min() >= bb[0] - 1e-3
    assert roof[:, 1].max() <= bb[3] + 1e-3


def test_pipeline_produces_consistent_geometry(bonai_ds):
    rng = np.random.RandomState(0)
    res = bonai_ds.prepare(0, rng)
    assert res["img"].shape[2] == 3
    assert res["img"].shape[0] % 32 == 0
    n = len(res["gt_bboxes"])
    assert len(res["gt_masks"]) == n and len(res["gt_offsets"]) == n
    # polygons stay inside their boxes after the pipeline
    for i in range(n):
        box = res["gt_bboxes"][i]
        for part in res["gt_masks"][i]:
            assert part[:, 0].min() >= box[0] - 1.5
            assert part[:, 0].max() <= box[2] + 1.5


def test_flip_consistency(bonai_ds):
    """Flipped offsets must match flipped geometry: find a flipped sample
    and check roof polygon − offset lands on the footprint location."""
    base = None
    for seed in range(20):
        rng = np.random.RandomState(seed)
        res = bonai_ds.prepare(0, rng)
        if res["flip"] and res["flip_direction"] == "horizontal":
            base = res
            break
    assert base is not None
    # for our synthetic rectangles: roof min-x - offset-x = footprint min-x
    # after h-flip offset x negates; verify sign convention survives by
    # reconstructing footprint from roof polygon and offset and checking it
    # stays within the building bbox
    for i in range(len(base["gt_bboxes"])):
        roof = base["gt_masks"][i][0]
        off = base["gt_offsets"][i]
        fp = roof - off[None, :]
        bb = base["gt_bboxes"][i]
        assert fp[:, 0].min() >= bb[0] - 1.5 and fp[:, 0].max() <= bb[2] + 1.5
        assert fp[:, 1].min() >= bb[1] - 1.5 and fp[:, 1].max() <= bb[3] + 1.5


def test_pack_sample_shapes(bonai_ds):
    res = bonai_ds.prepare(0, np.random.RandomState(1))
    sample, meta = pack_sample(res, max_gt=16, inst_mask_size=64)
    assert sample["image"].shape[2] == 3
    assert sample["gt_bboxes"].shape == (16, 4)
    assert sample["gt_masks"].shape == (16, 64, 64)
    assert sample["gt_valid"].sum() == len(res["gt_bboxes"])
    # rasterised instance mask covers the roof region of its bbox
    i = 0
    assert sample["gt_masks"][i].sum() > 0


def test_dataloader_batches(bonai_ds):
    loader = build_dataloader(bonai_ds, samples_per_gpu=2, num_devices=1,
                              seed=0, max_gt=16, inst_mask_size=64)
    batches = list(loader)
    assert len(batches) == len(bonai_ds) // 2
    batch, metas = batches[0]
    assert batch["image"].shape[0] == 2
    assert batch["gt_bboxes"].shape == (2, 16, 4)
    assert len(metas) == 2
    # deterministic across epochs given seed
    loader.set_epoch(0)
    b2, _ = next(iter(loader))
    np.testing.assert_allclose(batch["image"], b2["image"])


def test_concat_dataset(tmp_path):
    json_path, img_dir = make_bonai_dataset(str(tmp_path), num_images=3)
    ds = build_dataset(dict(
        type="BONAI", ann_file=[json_path, json_path],
        img_prefix=[img_dir, img_dir], bbox_type="building",
        mask_type="roof", pipeline=TRAIN_PIPELINE))
    assert len(ds) == 6
    assert ds.prepare(4, np.random.RandomState(0)) is not None


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = (rng.rand(37, 23) > 0.5).astype(np.uint8)
    rle = mask_utils.encode_mask(mask)
    back = mask_utils.decode_mask(rle)
    np.testing.assert_array_equal(mask, back)
    assert mask_utils.rle_area(rle) == int(mask.sum())


def test_rle_string_format_known_value():
    # pycocotools encodes a 3x3 mask with first column on as '31m2'?  We
    # assert self-consistency plus the delta-coding property instead of a
    # captured constant: counts round-trip through the string codec.
    counts = [0, 3, 6, 2, 7, 1]
    s = mask_utils.counts_to_string(counts)
    assert mask_utils.string_to_counts(s) == counts


def test_mask_iou():
    a = np.zeros((10, 10), np.uint8)
    a[:5] = 1
    b = np.zeros((10, 10), np.uint8)
    b[2:7] = 1
    ra, rb = mask_utils.encode_mask(a), mask_utils.encode_mask(b)
    iou = mask_utils.mask_iou([ra], [rb])[0, 0]
    assert abs(iou - 30 / 70) < 1e-6


def test_semi_supervised_plumbing(tmp_path):
    """only_footprint flag + footprint bboxes flow through pipeline/pack."""
    import json
    json_path, img_dir = make_bonai_dataset(str(tmp_path), num_images=2)
    with open(json_path) as f:
        data = json.load(f)
    for ann in data["annotations"]:
        if ann["image_id"] == 1:
            ann["only_footprint"] = 1
    with open(json_path, "w") as f:
        json.dump(data, f)
    pipeline = [dict(t) for t in TRAIN_PIPELINE]
    pipeline[1] = dict(type="LoadAnnotations", with_bbox=True,
                       with_mask=True, with_offset=True,
                       with_footprint_bbox=True,
                       with_only_footprint_flag=True)
    ds = BONAI(ann_file=json_path, pipeline=pipeline, img_prefix=img_dir,
               bbox_type="building", mask_type="roof")
    r0 = ds.prepare(0, np.random.RandomState(0))
    r1 = ds.prepare(1, np.random.RandomState(0))
    assert r0["gt_only_footprint_flag"] == 0.0
    assert r1["gt_only_footprint_flag"] == 1.0
    assert r1["gt_footprint_bboxes"].shape[1] == 4
    s, _ = pack_sample(r1, max_gt=16, inst_mask_size=32)
    assert s["gt_footprint_bboxes"].shape == (16, 4)
    assert s["gt_only_footprint_flag"] == 1.0
    # footprint boxes transformed consistently with building boxes
    assert (s["gt_footprint_bboxes"][:6, 2] > s["gt_footprint_bboxes"][:6, 0]).all()


def test_repeat_dataset_wrapper(bonai_ds, tmp_path):
    json_path, img_dir = make_bonai_dataset(str(tmp_path), num_images=3)
    ds = build_dataset(dict(
        type="RepeatDataset", times=4,
        dataset=dict(type="BONAI", ann_file=json_path, img_prefix=img_dir,
                     pipeline=TRAIN_PIPELINE)))
    assert len(ds) == 12
    a = ds.get_ann_info(1)
    b = ds.get_ann_info(1 + 3)
    np.testing.assert_allclose(a["bboxes"], b["bboxes"])
    assert ds.prepare(7, np.random.RandomState(0)) is not None


def test_class_balanced_dataset_wrapper(tmp_path):
    json_path, img_dir = make_bonai_dataset(str(tmp_path), num_images=4)
    ds = build_dataset(dict(
        type="ClassBalancedDataset", oversample_thr=1.0,
        dataset=dict(type="BONAI", ann_file=json_path, img_prefix=img_dir,
                     pipeline=TRAIN_PIPELINE)))
    # single-category dataset: f(c)=1 -> r=max(1, sqrt(thr/1)) = 1 -> no
    # oversampling at thr=1.0
    assert len(ds) == 4
    # thr=4.0 -> r = sqrt(4/1) = 2 per image
    ds2 = build_dataset(dict(
        type="ClassBalancedDataset", oversample_thr=4.0,
        dataset=dict(type="BONAI", ann_file=json_path, img_prefix=img_dir,
                     pipeline=TRAIN_PIPELINE)))
    assert len(ds2) == 8
    assert ds2.prepare(5, np.random.RandomState(0)) is not None


def test_loader_counts_gt_truncation(bonai_ds):
    loader = build_dataloader(bonai_ds, samples_per_gpu=2, num_devices=1,
                              seed=0, max_gt=2, inst_mask_size=32)
    _ = list(loader)
    # helper datasets have ~6 buildings/img > max_gt=2: every sample
    # truncates and the loader must expose the count
    assert loader.truncated_samples > 0
    assert loader.truncated_instances >= loader.truncated_samples


def test_image_cache_roundtrip(tmp_path):
    """LoadImageFromFile(cache_dir=...) must return identical pixels on
    the cold (decode+fill) and warm (cache hit) paths."""
    from bonai_tpu.datasets.pipelines import build_pipeline
    json_path, img_dir = make_bonai_dataset(str(tmp_path), num_images=1,
                                            size=64)
    ds = build_dataset(dict(type="BONAI", ann_file=json_path,
                            img_prefix=img_dir,
                            pipeline=[dict(type="LoadImageFromFile")]))
    fname = ds.data_infos[0]["filename"]
    cache = str(tmp_path / "cache")
    plain = build_pipeline([dict(type="LoadImageFromFile")])
    cached = build_pipeline([dict(type="LoadImageFromFile",
                                  cache_dir=cache)])

    def run(pipe):
        return pipe({"img_info": {"filename": fname},
                     "img_prefix": img_dir})["img"]

    ref = run(plain)
    cold = run(cached)
    warm = run(cached)
    np.testing.assert_array_equal(ref, cold)
    np.testing.assert_array_equal(ref, warm)
    import os
    assert any(f.endswith(".npy") for f in os.listdir(cache))
