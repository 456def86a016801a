"""Tests for the external-zoo checkpoint converters
(reference: ``tools/regnet2mmdet.py``, ``tools/detectron2pytorch.py``)."""

import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from tools.regnet2mmdet import convert_regnet_keys  # noqa: E402
from tools.detectron2pytorch import (  # noqa: E402
    convert_detectron_blobs)


def _fake_pycls_regnet():
    """Minimal pycls-style model_state: stem + 2 stages x 2 blocks."""
    blobs = {}
    blobs["stem.conv.weight"] = np.zeros((32, 3, 3, 3), np.float32)
    for suf in ("weight", "bias", "running_mean", "running_var"):
        blobs[f"stem.bn.{suf}"] = np.zeros((32,), np.float32)
    for si, w in [(1, 64), (2, 128)]:
        for bi in (1, 2):
            base = f"s{si}.b{bi}"
            if bi == 1:
                blobs[f"{base}.proj.weight"] = np.zeros(
                    (w, 32, 1, 1), np.float32)
                for suf in ("weight", "bias", "running_mean", "running_var"):
                    blobs[f"{base}.bn.{suf}"] = np.zeros((w,), np.float32)
            for conv, bn in (("a", "a_bn"), ("b", "b_bn"), ("c", "c_bn")):
                blobs[f"{base}.f.{conv}.weight"] = np.zeros(
                    (w, w, 3, 3), np.float32)
                for suf in ("weight", "bias", "running_mean", "running_var"):
                    blobs[f"{base}.f.{bn}.{suf}"] = np.zeros((w,), np.float32)
    blobs["head.fc.weight"] = np.zeros((1000, 128), np.float32)
    blobs["head.fc.bias"] = np.zeros((1000,), np.float32)
    return blobs


def test_regnet_key_mapping():
    blobs = _fake_pycls_regnet()
    sd, missed = convert_regnet_keys(blobs)
    assert not missed
    assert len(sd) == len(blobs)
    # stem
    assert "conv1.weight" in sd and "bn1.running_mean" in sd
    # block 1 of stage 1 -> layer1.0 with downsample
    assert "layer1.0.downsample.0.weight" in sd
    assert "layer1.0.downsample.1.running_var" in sd
    assert "layer1.0.conv1.weight" in sd
    assert "layer1.0.bn3.bias" in sd
    # block 2 -> layer1.1, no downsample
    assert "layer1.1.conv2.weight" in sd
    assert not any(k.startswith("layer1.1.downsample") for k in sd)
    # stage 2 -> layer2
    assert "layer2.0.downsample.0.weight" in sd
    assert "fc.weight" in sd
    # values pass through untouched
    assert sd["layer2.0.conv1.weight"] is blobs["s2.b1.f.a.weight"]


def test_regnet_rejects_unknown_reslayer_key():
    with pytest.raises(ValueError):
        convert_regnet_keys({"s1.b1.zzz.weight": np.zeros(1)})


def _fake_detectron_r50():
    blobs = {}
    blobs["conv1_w"] = np.random.randn(64, 3, 7, 7).astype(np.float32)
    blobs["res_conv1_bn_s"] = np.random.randn(64).astype(np.float32)
    blobs["res_conv1_bn_b"] = np.random.randn(64).astype(np.float32)
    widths = [256, 512, 1024, 2048]
    for i, n in enumerate((3, 4, 6, 3), start=1):
        w = widths[i - 1]
        for j in range(n):
            if j == 0:
                blobs[f"res{i + 1}_{j}_branch1_w"] = np.random.randn(
                    w, w // 4, 1, 1).astype(np.float32)
                blobs[f"res{i + 1}_{j}_branch1_bn_s"] = np.random.randn(
                    w).astype(np.float32)
                blobs[f"res{i + 1}_{j}_branch1_bn_b"] = np.random.randn(
                    w).astype(np.float32)
            for letter, cw in zip("abc", (w // 4, w // 4, w)):
                blobs[f"res{i + 1}_{j}_branch2{letter}_w"] = np.random.randn(
                    cw, 8, 3, 3).astype(np.float32)
                blobs[f"res{i + 1}_{j}_branch2{letter}_bn_s"] = \
                    np.random.randn(cw).astype(np.float32)
                blobs[f"res{i + 1}_{j}_branch2{letter}_bn_b"] = \
                    np.random.randn(cw).astype(np.float32)
    return blobs


def test_detectron_conversion_r50():
    blobs = _fake_detectron_r50()
    sd, missed = convert_detectron_blobs(blobs, 50)
    assert not missed
    # affine-channel -> BN: identity running stats
    np.testing.assert_array_equal(sd["bn1.running_mean"], np.zeros(64))
    np.testing.assert_array_equal(sd["bn1.running_var"], np.ones(64))
    np.testing.assert_array_equal(sd["bn1.weight"], blobs["res_conv1_bn_s"])
    np.testing.assert_array_equal(sd["bn1.bias"], blobs["res_conv1_bn_b"])
    # stage/block naming: res2_0 -> layer1.0 (with downsample), res5_2 ->
    # layer4.2
    assert "layer1.0.downsample.0.weight" in sd
    assert "layer4.2.conv3.weight" in sd
    assert "layer1.1.downsample.0.weight" not in sd
    np.testing.assert_array_equal(
        sd["layer3.4.conv2.weight"], blobs["res4_4_branch2b_w"])


def test_detectron_depth_check():
    with pytest.raises(ValueError):
        convert_detectron_blobs({}, 18)


def test_detectron_bn_count_r50():
    sd, _ = convert_detectron_blobs(_fake_detectron_r50(), 50)
    n_bn = sum(1 for k in sd if k.endswith(".running_mean"))
    # stem(1) + 3 per block (3+4+6+3=16 blocks) + 1 downsample per stage(4)
    assert n_bn == 1 + 16 * 3 + 4


def test_regnet_feeds_torch_importer(tmp_path):
    """End-to-end through the CLI convert(): pycls pth -> mmdet-style pth
    loadable by import_torch_state_dict."""
    torch = pytest.importorskip("torch")
    from tools.regnet2mmdet import convert
    from bonai_tpu.utils.torch_import import import_torch_state_dict
    blobs = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in _fake_pycls_regnet().items()}
    src = tmp_path / "pycls.pth"
    dst = tmp_path / "mmdet.pth"
    torch.save({"model_state": blobs}, src)
    convert(str(src), str(dst))
    sd = import_torch_state_dict(str(dst))
    assert "layer1.0.downsample.1.running_mean" in sd
    assert sd["conv1.weight"].shape == (32, 3, 3, 3)
