"""robustness_eval aggregation parity (reference
``tools/robustness_eval.py:8-250``): COCO-style per-corruption x
severity tables, VOC mode, benchmark-vs-all aggregation."""

import os.path as osp
import pickle
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.join(REPO, "tools"))

from robustness_eval import (get_coco_style_results, get_results,
                             get_voc_style_results,
                             get_distortions_from_results)


def _coco_eval_output(n_corr=3, clean_ap=0.4, corr_ap=0.2):
    out = {}
    for i in range(n_corr):
        name = f"corr_{i}"
        out[name] = {}
        for sev in range(6):
            ap = clean_ap if sev == 0 else corr_ap
            out[name][sev] = {"bbox": {"AP": ap, "AP50": ap + 0.1,
                                       "AP75": ap - 0.05}}
    return out


def test_coco_mpc_rpc_math(capsys):
    res = get_coco_style_results(_coco_eval_output(), task="bbox",
                                 metric=["AP", "AP50"], prints="all",
                                 aggregate="all")
    assert res.shape == (3, 6, 2)
    text = capsys.readouterr().out
    # P = clean AP of the first distortion at severity 0
    assert "AP    =  0.400" in text
    # mPC = mean over severities 1-5 of all distortions = 0.2
    assert "AP    =  0.200" in text
    # rPC = 0.2 / 0.4 = 50%
    assert "AP    => 50.0 %" in text
    assert "Performance on Clean Data [P] (bbox)" in text
    assert "Mean Performance under Corruption [mPC] (bbox)" in text


def test_coco_full_table_layout(capsys):
    out = _coco_eval_output()
    get_coco_style_results(out, task="bbox", metric=None, prints=["mPC"],
                           aggregate="all")
    text = capsys.readouterr().out
    # the standard 12-row COCO summary block
    assert text.count("Average Precision") == 6
    assert text.count("Average Recall") == 6
    assert "@[ IoU=0.50:0.95 | area=   all | maxDets=100 ]" in text
    assert "@[ IoU=0.50      | area=   all | maxDets=100 ]" in text


def test_benchmark_aggregate_uses_first_15():
    out = _coco_eval_output(n_corr=17, corr_ap=0.2)
    # distortions 15, 16 have a different AP; benchmark mode must ignore them
    for name in ("corr_15", "corr_16"):
        for sev in range(1, 6):
            out[name][sev]["bbox"]["AP"] = 0.99
    res_bench = get_coco_style_results(out, metric=["AP"], prints=["mPC"],
                                       aggregate="benchmark")
    assert res_bench.shape[0] == 17
    mpc_bench = res_bench[:15, 1:, 0].mean()
    assert mpc_bench == pytest.approx(0.2)


def test_voc_mode(capsys):
    out = {}
    for i in range(2):
        out[f"c{i}"] = {}
        for sev in range(6):
            ap = 0.6 if sev == 0 else 0.3
            out[f"c{i}"][sev] = [{"ap": ap} for _ in range(20)]
    res = get_voc_style_results(out, prints="all", aggregate="all")
    assert res.shape == (2, 6, 1)
    text = capsys.readouterr().out
    assert "[P] in AP50 = 0.600" in text
    assert "[mPC] in AP50 = 0.300" in text
    assert "[rPC] in % = 50.0" in text


def test_get_results_dispatch_and_file_loading(tmp_path, capsys):
    out = _coco_eval_output()
    p = str(tmp_path / "agg.pkl")
    with open(p, "wb") as f:
        pickle.dump(out, f)
    res = get_results(p, dataset="coco", task="bbox", metric=["AP"],
                      prints=["rPC"])
    assert res.shape == (3, 6, 1)
    assert "model: agg.pkl" in capsys.readouterr().out


def test_distortion_names():
    assert get_distortions_from_results(
        {"gaussian_noise": {}, "motion_blur": {}}) == \
        ["gaussian noise", "motion blur"]


@pytest.mark.parametrize("name", [
    "gaussian_noise", "shot_noise", "impulse_noise", "defocus_blur",
    "glass_blur", "motion_blur", "zoom_blur", "snow", "frost", "fog",
    "brightness", "contrast", "elastic_transform", "pixelate",
    "jpeg_compression", "gaussian_blur"])
def test_all_benchmark_corruptions_run(name):
    from bonai_tpu.datasets.pipelines.corrupt import corrupt_image
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
    for sev in (1, 5):
        out = corrupt_image(img, name, sev, np.random.RandomState(1))
        assert out.shape == img.shape
        assert out.dtype == np.uint8
        assert np.isfinite(out.astype(np.float64)).all()
    # severity 5 must distort at least as much as severity 1
    d1 = np.abs(corrupt_image(img, name, 1, np.random.RandomState(1))
                .astype(np.float64) - img).mean()
    d5 = np.abs(corrupt_image(img, name, 5, np.random.RandomState(1))
                .astype(np.float64) - img).mean()
    assert d5 >= d1 * 0.8, f"{name}: sev5 {d5:.2f} < sev1 {d1:.2f}"
