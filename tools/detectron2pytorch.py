#!/usr/bin/env python
"""Convert caffe2/Detectron-pretrained ResNet pickles to torchvision-style
state_dicts consumed by ``bonai_tpu.utils.torch_import``.

Reference analog: ``tools/detectron2pytorch.py`` — Detectron stores BN as
an affine-channel layer (``<name>_bn_{s,b}``) with no running stats; the
conversion synthesizes ``running_mean=0 / running_var=1`` so the affine
transform is reproduced exactly by a standard (frozen) BN.
Blob schema: ``conv1_w``, ``res_conv1_bn_{s,b}``,
``res<i+1>_<j>_branch1{_w,_bn_{s,b}}`` (downsample),
``res<i+1>_<j>_branch2{a,b,c}{_w,_bn_{s,b}}`` (the 3 bottleneck convs).
"""

import argparse
import pickle
from collections import OrderedDict

import numpy as np

arch_settings = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def _convert_bn(blobs, state_dict, caffe_name, torch_name, converted):
    scale = np.asarray(blobs[caffe_name + "_s"])
    state_dict[torch_name + ".weight"] = scale
    state_dict[torch_name + ".bias"] = np.asarray(blobs[caffe_name + "_b"])
    state_dict[torch_name + ".running_mean"] = np.zeros_like(scale)
    state_dict[torch_name + ".running_var"] = np.ones_like(scale)
    converted.add(caffe_name + "_s")
    converted.add(caffe_name + "_b")


def _convert_conv_fc(blobs, state_dict, caffe_name, torch_name, converted):
    state_dict[torch_name + ".weight"] = np.asarray(blobs[caffe_name + "_w"])
    converted.add(caffe_name + "_w")
    if caffe_name + "_b" in blobs:
        state_dict[torch_name + ".bias"] = np.asarray(
            blobs[caffe_name + "_b"])
        converted.add(caffe_name + "_b")


def convert_detectron_blobs(blobs, depth):
    """Pure conversion on a ``{blob_name: array}`` dict.  Returns
    ``(state_dict, unconverted_keys)``."""
    if depth not in arch_settings:
        raise ValueError("Only support ResNet-50 and ResNet-101 currently")
    block_nums = arch_settings[depth]
    state_dict = OrderedDict()
    converted = set()
    _convert_conv_fc(blobs, state_dict, "conv1", "conv1", converted)
    _convert_bn(blobs, state_dict, "res_conv1_bn", "bn1", converted)
    for i in range(1, len(block_nums) + 1):
        for j in range(block_nums[i - 1]):
            if j == 0:
                _convert_conv_fc(blobs, state_dict, f"res{i + 1}_{j}_branch1",
                                 f"layer{i}.{j}.downsample.0", converted)
                _convert_bn(blobs, state_dict, f"res{i + 1}_{j}_branch1_bn",
                            f"layer{i}.{j}.downsample.1", converted)
            for k, letter in enumerate(["a", "b", "c"]):
                _convert_conv_fc(blobs, state_dict,
                                 f"res{i + 1}_{j}_branch2{letter}",
                                 f"layer{i}.{j}.conv{k + 1}", converted)
                _convert_bn(blobs, state_dict,
                            f"res{i + 1}_{j}_branch2{letter}_bn",
                            f"layer{i}.{j}.bn{k + 1}", converted)
    missed = [k for k in blobs if k not in converted]
    return state_dict, missed


def convert(src, dst, depth):
    with open(src, "rb") as f:
        caffe_model = pickle.load(f, encoding="latin1")
    blobs = caffe_model.get("blobs", caffe_model)
    state_dict, missed = convert_detectron_blobs(blobs, depth)
    for key in missed:
        print(f"Not Convert: {key}")
    import torch
    torch.save({"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                               for k, v in state_dict.items()}}, dst)
    print(f"saved {len(state_dict)} keys -> {dst}")


def main():
    parser = argparse.ArgumentParser(description="Convert model keys")
    parser.add_argument("src", help="src detectron model path (.pkl)")
    parser.add_argument("dst", help="save path (.pth)")
    parser.add_argument("depth", type=int, help="ResNet model depth")
    args = parser.parse_args()
    convert(args.src, args.dst, args.depth)


if __name__ == "__main__":
    main()
