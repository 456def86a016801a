#!/usr/bin/env python
"""Fold frozen BatchNorm statistics into conv kernels for inference
(reference: ``tools/fuse_conv_bn.py``).

Our BN layers are frozen affines over stored running stats, so folding
``y = (conv(x) - mean) * scale/sqrt(var+eps) + bias`` into the conv kernel
and a bias term is exact.  Saves the affine multiply-add per BN at
inference (XLA usually fuses it anyway — this is primarily checkpoint/
deploy parity).
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


CONV_BN_PAIRS = [("conv1", "bn1"), ("conv2", "bn2"), ("conv3", "bn3"),
                 ("ds_conv", "ds_bn")]


def fuse_tree(params, batch_stats, eps=1e-5):
    """Fold running statistics into the BN affine (scale' = scale·rsqrt
    (var+eps), bias' = bias − mean·scale', stats reset to identity).
    Output is bit-identical while keeping the parameter structure (our
    convs are bias-free, so folding into the conv would change the tree).
    """
    import copy
    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)

    def walk(p, s):
        if not isinstance(p, dict) or not isinstance(s, dict):
            return
        for key in list(p.keys()):
            sub_s = s.get(key)
            if (isinstance(p[key], dict) and isinstance(sub_s, dict)
                    and "mean" in sub_s and "scale" in p[key]):
                scale = np.asarray(p[key]["scale"])
                bias = np.asarray(p[key]["bias"])
                mean = np.asarray(sub_s["mean"])
                var = np.asarray(sub_s["var"])
                inv = scale / np.sqrt(var + eps)
                p[key]["scale"] = inv * np.sqrt(1.0 + eps)  # identity stats
                p[key]["bias"] = bias - mean * inv
                sub_s["mean"] = np.zeros_like(mean)
                sub_s["var"] = np.ones_like(var)
            elif isinstance(p[key], dict):
                walk(p[key], sub_s if isinstance(sub_s, dict) else {})

    walk(params, batch_stats)
    return params, batch_stats


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("in_ckpt", help="orbax checkpoint dir (step_N)")
    parser.add_argument("out_ckpt")
    args = parser.parse_args()
    import orbax.checkpoint as ocp
    ckpter = ocp.StandardCheckpointer()
    restored = ckpter.restore(osp.join(args.in_ckpt, "state"))
    fused_p, fused_s = fuse_tree(restored["params"],
                                 restored.get("batch_stats", {}))
    payload = dict(restored)
    payload["params"] = fused_p
    payload["batch_stats"] = fused_s
    ckpter.save(osp.join(osp.abspath(args.out_ckpt), "state"), payload,
                force=True)
    ckpter.wait_until_finished()
    print(f"fused checkpoint written to {args.out_ckpt}")


if __name__ == "__main__":
    main()
