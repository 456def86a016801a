#!/usr/bin/env python
"""Convert pycls-pretrained RegNet checkpoints to the torchvision-style
key naming consumed by ``bonai_tpu.utils.torch_import`` (and by the
reference's mmdet loaders).

Reference analog: ``tools/regnet2mmdet.py`` (pycls ``model_state`` blobs
``stem.conv/ stem.bn / s<i>.b<j>.{proj,bn,f.{a,b,c,a_bn,b_bn,c_bn}}`` →
``conv1/bn1/layer<i>.<j-1>.{conv,bn}{1,2,3}/downsample.{0,1}``).

The output is a ``{'state_dict': {...}}`` torch checkpoint, loadable by
``import_torch_state_dict`` + ``torchvision_resnet_to_params`` for RegNet
backbone init in this framework.
"""

import argparse
from collections import OrderedDict


def _convert_stem(key):
    new = key.replace("stem.conv", "conv1").replace("stem.bn", "bn1")
    return new


def _convert_head(key):
    return key.replace("head.fc", "fc")


def _convert_reslayer(key):
    split = key.split(".")
    layer, block, module = split[:3]
    block_id = int(block[1:])
    layer_name = f"layer{int(layer[1:])}"
    block_name = f"{block_id - 1}"
    if block_id == 1 and module == "bn":
        return f"{layer_name}.{block_name}.downsample.1.{split[-1]}"
    if block_id == 1 and module == "proj":
        return f"{layer_name}.{block_name}.downsample.0.{split[-1]}"
    if module == "f":
        sub = split[3]
        mapping = {"a": "conv1", "b": "conv2", "c": "conv3",
                   "a_bn": "bn1", "b_bn": "bn2", "c_bn": "bn3"}
        if sub not in mapping:
            raise ValueError(f"Unsupported conversion of key {key}")
        return f"{layer_name}.{block_name}.{mapping[sub]}.{split[-1]}"
    raise ValueError(f"Unsupported conversion of key {key}")


def convert_regnet_keys(blobs):
    """Pure key-mapping on a ``{pycls_key: array}`` dict.  Returns
    ``(state_dict, unconverted_keys)``."""
    state_dict = OrderedDict()
    missed = []
    for key, weight in blobs.items():
        if "stem" in key:
            state_dict[_convert_stem(key)] = weight
        elif "head" in key:
            state_dict[_convert_head(key)] = weight
        elif key.startswith("s"):
            state_dict[_convert_reslayer(key)] = weight
        else:
            missed.append(key)
    return state_dict, missed


def convert(src, dst):
    import torch
    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    blobs = ckpt.get("model_state", ckpt)
    state_dict, missed = convert_regnet_keys(blobs)
    for key in missed:
        print(f"not converted: {key}")
    torch.save({"state_dict": state_dict}, dst)
    print(f"saved {len(state_dict)} keys -> {dst}")


def main():
    parser = argparse.ArgumentParser(description="Convert model keys")
    parser.add_argument("src", help="src pycls RegNet model path")
    parser.add_argument("dst", help="save path")
    args = parser.parse_args()
    convert(args.src, args.dst)


if __name__ == "__main__":
    main()
