"""BONAI dataset tail: only_footprint mask override, dense
edge/side-face/offset-field pipeline, per-city prefix plumbing,
results2json / write_results2csv.

Reference semantics: ``mmdet/datasets/bonai.py:17-80,105-328``,
``mmdet/datasets/pipelines/loading.py:441-583``,
``transforms.py:272-290,508-537,605-616``, ``builder.py:26-55``.
"""

import json
import os
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from helpers import make_bonai_dataset


def _aux_dirs(root, json_path, size):
    """Create edge/side-face pngs + offset-field npys for every image."""
    import cv2
    with open(json_path) as f:
        data = json.load(f)
    dirs = {}
    for kind in ("edge", "side_face", "offset_field"):
        d = osp.join(root, kind)
        os.makedirs(d, exist_ok=True)
        dirs[kind] = d
    rng = np.random.RandomState(3)
    for info in data["images"]:
        stem = info["file_name"].rsplit(".", 1)[0]
        edge = (rng.rand(size, size) > 0.9).astype(np.uint8) * 255
        cv2.imwrite(osp.join(dirs["edge"], stem + ".png"), edge)
        cv2.imwrite(osp.join(dirs["side_face"], stem + ".png"), edge)
        field = rng.uniform(-20, 20, (size, size, 2)).astype(np.float32)
        field[:4, :4, 0] = 400.0    # ignore sentinels
        field[:4, :4, 1] = 500.0
        np.save(osp.join(dirs["offset_field"], stem + ".npy"), field)
    return dirs


PIPE_FIELDS = [
    dict(type="LoadImageFromFile"),
    dict(type="LoadAnnotations", with_bbox=True, with_mask=True,
         with_offset=True, with_edge=True, with_side_face=True,
         with_offset_field=True),
    dict(type="Resize", img_scale=(128, 128), keep_ratio=True),
    dict(type="RandomFlip", flip_ratio=1.0, direction="horizontal"),
    dict(type="Pad", size_divisor=32),
    dict(type="Collect", keys=["img", "gt_bboxes", "gt_offsets"]),
]


@pytest.fixture(scope="module")
def field_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bonai_fields"))
    json_path, img_dir = make_bonai_dataset(root, num_images=2, size=256,
                                            buildings_per_img=3)
    dirs = _aux_dirs(root, json_path, 256)
    from bonai_tpu.datasets import build_dataset
    ds = build_dataset(dict(
        type="BONAI", ann_file=json_path, img_prefix=img_dir,
        edge_prefix=dirs["edge"], side_face_prefix=dirs["side_face"],
        offset_field_prefix=dirs["offset_field"],
        bbox_type="building", mask_type="roof", pipeline=PIPE_FIELDS))
    return ds, dirs


def test_offset_field_survives_flip_resize_pad(field_dataset):
    ds, dirs = field_dataset
    res = ds.prepare(0, rng=np.random.RandomState(0))
    stem = ds.data_infos[0]["filename"].rsplit(".", 1)[0]
    raw = np.load(osp.join(dirs["offset_field"], stem + ".npy"))
    # loader zeroes the 400/500 sentinels
    assert raw[0, 0, 0] == 400.0 and raw[0, 0, 1] == 500.0
    field = res["gt_offset_field"]
    # resized 256 -> 128, padded to /32 (=128)
    assert field.shape == (128, 128, 2)
    # h-flip: x component negated + spatially mirrored.  nearest resize by
    # 0.5 takes every other source pixel; compare an interior pixel.
    src = raw[10, 10]
    got = field[5, 127 - 5]
    assert got[0] == -src[0]
    assert got[1] == src[1]
    # edge / side-face maps ride along with the same canvas
    assert res["gt_edge_maps"].shape == (128, 128)
    assert res["gt_side_face_maps"].shape == (128, 128)


def test_pack_sample_carries_dense_fields(field_dataset):
    ds, _ = field_dataset
    from bonai_tpu.datasets.builder import pack_sample
    res = ds.prepare(0, rng=np.random.RandomState(1))
    out, _meta = pack_sample(res, max_gt=8, inst_mask_size=32)
    assert out["gt_offset_field"].shape == (128, 128, 2)
    assert out["gt_edge_maps"].shape == (128, 128)


def test_only_footprint_mask_override(tmp_path):
    root = str(tmp_path)
    json_path, img_dir = make_bonai_dataset(root, num_images=1, size=128,
                                            buildings_per_img=2)
    with open(json_path) as f:
        data = json.load(f)
    for ann in data["annotations"]:
        ann["only_footprint"] = 1
    with open(json_path, "w") as f:
        json.dump(data, f)
    from bonai_tpu.datasets import build_dataset
    ds = build_dataset(dict(
        type="BONAI", ann_file=json_path, img_prefix=img_dir,
        bbox_type="building", mask_type="roof",
        pipeline=[dict(type="LoadImageFromFile"),
                  dict(type="LoadAnnotations", with_bbox=True,
                       with_mask=True, with_only_footprint_flag=True),
                  dict(type="Collect", keys=["img", "gt_bboxes"])]))
    ann = ds.get_ann_info(0)
    assert ann["only_footprint_flag"] == 1.0
    # despite mask_type='roof', training masks must be the footprints
    for m, fm in zip(ann["masks"], ann["footprint_masks"]):
        np.testing.assert_array_equal(np.asarray(m, dtype=np.float64),
                                      np.asarray(fm, dtype=np.float64))
    res = ds.prepare(0, rng=np.random.RandomState(0))
    assert res["gt_only_footprint_flag"] == 1.0


def test_concat_prefix_plumbing(tmp_path):
    roots = []
    for city in ("a", "b"):
        r = str(tmp_path / city)
        os.makedirs(r, exist_ok=True)
        jp, imgd = make_bonai_dataset(r, num_images=1, size=128,
                                      buildings_per_img=2)
        dirs = _aux_dirs(r, jp, 128)
        roots.append((jp, imgd, dirs))
    from bonai_tpu.datasets import build_dataset
    ds = build_dataset(dict(
        type="BONAI",
        ann_file=[r[0] for r in roots],
        img_prefix=[r[1] for r in roots],
        edge_prefix=[r[2]["edge"] for r in roots],
        side_face_prefix=[r[2]["side_face"] for r in roots],
        offset_field_prefix=[r[2]["offset_field"] for r in roots],
        bbox_type="building", mask_type="roof", pipeline=PIPE_FIELDS))
    assert len(ds.datasets) == 2
    for i, sub in enumerate(ds.datasets):
        assert sub.edge_prefix == roots[i][2]["edge"]
        assert sub.offset_field_prefix == roots[i][2]["offset_field"]
    res = ds.prepare(1, rng=np.random.RandomState(0))  # second city
    assert res["gt_offset_field"].shape[-1] == 2


def test_results2json_tuple_lengths(tmp_path):
    json_path, img_dir = make_bonai_dataset(str(tmp_path), num_images=2,
                                            size=128, buildings_per_img=2)
    from bonai_tpu.datasets import build_dataset
    ds = build_dataset(dict(
        type="BONAI", ann_file=json_path, img_prefix=img_dir,
        bbox_type="building", mask_type="roof",
        pipeline=[dict(type="LoadImageFromFile"),
                  dict(type="Collect", keys=["img"])], test_mode=True))
    det = [np.array([[1., 2., 30., 40., 0.9]])]
    rle = {"size": [128, 128], "counts": "PPYa1"}
    seg = [[rle]]
    offs = np.array([[3.0, -4.0]])
    hts = np.array([12.0])
    results = [(det, seg, offs, hts), (det, seg, offs)]
    files = ds.results2json(results, str(tmp_path / "out"))
    with open(files["bbox"]) as f:
        bbox = json.load(f)
    assert len(bbox) == 2
    assert bbox[0]["bbox"] == [1.0, 2.0, 29.0, 38.0]
    with open(files["segm"]) as f:
        segm = json.load(f)
    assert segm[0]["segmentation"]["counts"] == "PPYa1"
    with open(files["offset"]) as f:
        off = json.load(f)
    assert off[0]["offset"] == [3.0, -4.0]
    assert off[0]["building_height"] == 12.0
    assert "building_height" not in off[1]


def test_write_results2csv(tmp_path):
    json_path, img_dir = make_bonai_dataset(str(tmp_path), num_images=1,
                                            size=128, buildings_per_img=2)
    from bonai_tpu.datasets import build_dataset
    ds = build_dataset(dict(
        type="BONAI", ann_file=json_path, img_prefix=img_dir,
        bbox_type="building", mask_type="roof",
        pipeline=[dict(type="LoadImageFromFile"),
                  dict(type="Collect", keys=["img"])], test_mode=True))
    seg_results = {t: dict(F1_score=0.5, Precision=0.6, Recall=0.4,
                           TP=10, FP=5, FN=15)
                   for t in ("roof", "footprint")}
    summary = str(tmp_path / "summary.csv")
    ds.write_results2csv([seg_results], dict(
        summary_file=summary, model="m", anno_file="a",
        gt_roof_csv_file="r", gt_footprint_csv_file="f", vis_dir="v"))
    text = open(summary).read()
    assert "roof" in text and "footprint" in text
    assert "F1 Score,0.5" in text
    assert "True Positive,10" in text


def test_only_footprint_last_value_wins(tmp_path):
    """The flag is re-evaluated per ann carrying the key (reference
    bonai.py:162-167): a later only_footprint=0 switches masks back."""
    root = str(tmp_path)
    json_path, img_dir = make_bonai_dataset(root, num_images=1, size=128,
                                            buildings_per_img=3)
    with open(json_path) as f:
        data = json.load(f)
    anns = data["annotations"]
    anns[0]["only_footprint"] = 1
    anns[1]["only_footprint"] = 0
    # anns[2] has no key: retains the previous (0) value
    with open(json_path, "w") as f:
        json.dump(data, f)
    from bonai_tpu.datasets import build_dataset
    ds = build_dataset(dict(
        type="BONAI", ann_file=json_path, img_prefix=img_dir,
        bbox_type="building", mask_type="roof",
        pipeline=[dict(type="LoadImageFromFile"),
                  dict(type="LoadAnnotations", with_bbox=True,
                       with_mask=True),
                  dict(type="Collect", keys=["img", "gt_bboxes"])]))
    ann = ds.get_ann_info(0)
    m = [np.asarray(x, np.float64) for x in ann["masks"]]
    roof = [np.asarray(x, np.float64) for x in ann["roof_masks"]]
    fp = [np.asarray(x, np.float64) for x in ann["footprint_masks"]]
    np.testing.assert_array_equal(m[0], fp[0])      # flag=1 -> footprint
    np.testing.assert_array_equal(m[1], roof[1])    # flag reset to 0 -> roof
    np.testing.assert_array_equal(m[2], roof[2])    # no key: stays 0
