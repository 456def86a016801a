#!/usr/bin/env python
"""Upgrade mmdetection v1.x checkpoints to the v2 conventions consumed
by ``bonai_tpu.utils.torch_import``.

reference: ``tools/upgrade_model_version.py`` — three semantic changes
between v1 and v2:
  1. class channels: background moved from slot 0 to the LAST slot
     (cls logits of fc_cls / conv_cls / retina_cls / rpn_cls ...);
  2. per-class regression: the background class's 4 deltas are dropped
     (fc_reg), shrinking (C+1)*4 -> C*4;
  3. mask logits: the background channel is dropped entirely.

Usage: python tools/upgrade_model_version.py IN.pth OUT.pth
         [--num-classes 81] [--two-stage]
``--num-classes`` counts classes INCLUDING background (v1 convention).
"""

import argparse
import os.path as osp
import re
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

HEAD_PREFIXES = ("bbox_head", "mask_head", "semantic_head", "grid_head",
                 "mask_iou_head")


def bg_first_to_last(a, nc):
    """Move the leading background slot to the end along dim 0 (groups
    of size nc when the tensor packs multiple anchors)."""
    n = a.shape[0]
    if n == nc:
        return np.concatenate([a[1:], a[:1]], axis=0)
    if n % nc == 0 and n != nc:
        g = a.reshape(-1, nc, *a.shape[1:])
        g = np.concatenate([g[:, 1:], g[:, :1]], axis=1)
        return g.reshape(a.shape)
    return a


def drop_bg_reg(a, nc):
    """(C+1)*4 regression channels -> C*4 (background deltas removed)."""
    n = a.shape[0]
    if n % nc == 0:
        g = a.reshape(nc, -1, *a.shape[1:])[1:]
        return g.reshape(-1, *a.shape[1:])
    return a


def drop_bg_cls(a, nc):
    """Mask logits: drop the background channel."""
    n = a.shape[0]
    if n % nc == 0:
        g = a.reshape(nc, -1, *a.shape[1:])[1:]
        return g.reshape(-1, *a.shape[1:])
    return a


def upgrade_state_dict(sd, num_classes=81, two_stage=True):
    out = {}
    for key, val in sd.items():
        a = np.asarray(val)
        new_key = key
        if two_stage and key.startswith(HEAD_PREFIXES):
            new_key = f"roi_head.{key}"
        if re.search(r"(conv_cls|retina_cls|rpn_cls|fc_cls|fcos_cls|"
                     r"fovea_cls)\.(weight|bias)", new_key):
            a = bg_first_to_last(a, num_classes)
        elif re.search(r"fc_reg\.(weight|bias)", new_key):
            a = drop_bg_reg(a, num_classes)
        elif re.search(r"conv_logits\.(weight|bias)", new_key):
            a = drop_bg_cls(a, num_classes)
        out[new_key] = a
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("in_file")
    p.add_argument("out_file")
    p.add_argument("--num-classes", type=int, default=81)
    p.add_argument("--two-stage", action="store_true", default=True)
    args = p.parse_args()
    import torch
    ckpt = torch.load(args.in_file, map_location="cpu",
                      weights_only=False)
    sd = ckpt.pop("state_dict", ckpt)
    new_sd = upgrade_state_dict(
        {k: v.numpy() if hasattr(v, "numpy") else v
         for k, v in sd.items()},
        args.num_classes, args.two_stage)
    payload = {"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                              for k, v in new_sd.items()},
               "meta": (ckpt.get("meta", {}) if isinstance(ckpt, dict)
                        else {})}
    torch.save(payload, args.out_file)
    print(f"wrote {args.out_file} ({len(new_sd)} tensors)")


if __name__ == "__main__":
    main()
