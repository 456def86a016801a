"""Torch checkpoint importers.

Two import paths needed for parity with the reference
(SURVEY.md §7 hard part #7):
- torchvision ResNet-50 ImageNet weights → backbone init
  (reference: ``pretrained='torchvision://resnet50'``,
  ``configs/_base_/models/bonai_loft_foa_r50_fpn_basic.py:4``)
- a full mmdet/LOFT checkpoint (the released ``bc_v100.02.08`` model) →
  every head, for eval-parity validation.

Conventions: torch convs are OIHW, flax NHWC convs are HWIO; torch Linear
weights are (out, in), flax Dense kernels (in, out).  The bbox/mask/offset
head FCs consume flattened RoI features; torch flattens NCHW (C, H, W)
while we flatten NHWC (H, W, C), so first-FC weights are additionally
permuted channel-wise.
"""

from __future__ import annotations

import logging
import os
import os.path as osp

import numpy as np

logger = logging.getLogger("bonai_tpu")


def _conv_w(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))     # OIHW -> HWIO


def _deconv_w(w):
    # torch ConvTranspose2d weight is (in, out, kh, kw); flax ConvTranspose
    # kernel is (kh, kw, in, out) and correlates the mirrored kernel, which
    # matches torch's transposed-conv semantics after flipping H/W.
    w = np.asarray(w)
    w = np.transpose(w, (2, 3, 0, 1))                    # (kh, kw, in, out)
    return w[::-1, ::-1]


def _fc_w(w):
    return np.transpose(np.asarray(w), (1, 0))           # (out,in)->(in,out)


def _fc_w_from_chw(w, c, h, ww):
    """First-FC weight on flattened RoI features: reorder the input axis
    from torch's (C, H, W) flatten to our (H, W, C) flatten."""
    w = np.asarray(w)                                    # (out, C*H*W)
    w = w.reshape(w.shape[0], c, h, ww)
    w = np.transpose(w, (0, 2, 3, 1)).reshape(w.shape[0], h * ww * c)
    return np.transpose(w, (1, 0))


def import_torch_state_dict(path):
    """Load a .pth file into a flat {key: numpy} dict (CPU)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() for k, v in sd.items()
            if hasattr(v, "numpy")}


def torchvision_resnet_to_params(sd, params, batch_stats, prefix=""):
    """Map torchvision resnet keys into our backbone param tree in place
    (returns new copies)."""
    import copy
    params = copy.deepcopy(jax_to_mutable(params))
    batch_stats = copy.deepcopy(jax_to_mutable(batch_stats))
    bk = params["backbone"]
    bs = batch_stats.get("backbone", {})

    def set_bn(dst_p, dst_s, base):
        dst_p["scale"] = np.asarray(sd[base + ".weight"])
        dst_p["bias"] = np.asarray(sd[base + ".bias"])
        dst_s["mean"] = np.asarray(sd[base + ".running_mean"])
        dst_s["var"] = np.asarray(sd[base + ".running_var"])

    bk["conv1"]["kernel"] = _conv_w(sd[prefix + "conv1.weight"])
    set_bn(bk["bn1"], bs["bn1"], prefix + "bn1")
    for layer in range(1, 5):
        b = 0
        while f"{prefix}layer{layer}.{b}.conv1.weight" in sd:
            dst = bk[f"layer{layer}_{b}"]
            dsts = bs[f"layer{layer}_{b}"]
            base = f"{prefix}layer{layer}.{b}"
            ncv = 3 if f"{base}.conv3.weight" in sd else 2
            for ci in range(1, ncv + 1):
                dst[f"conv{ci}"]["kernel"] = _conv_w(
                    sd[f"{base}.conv{ci}.weight"])
                set_bn(dst[f"bn{ci}"], dsts[f"bn{ci}"], f"{base}.bn{ci}")
            if f"{base}.downsample.0.weight" in sd:
                dst["ds_conv"]["kernel"] = _conv_w(
                    sd[f"{base}.downsample.0.weight"])
                set_bn(dst["ds_bn"], dsts["ds_bn"], f"{base}.downsample.1")
            b += 1
    return params, batch_stats


def jax_to_mutable(tree):
    if hasattr(tree, "unfreeze"):
        return tree.unfreeze()
    if isinstance(tree, dict):
        return {k: jax_to_mutable(v) for k, v in tree.items()}
    return tree


def load_pretrained_backbone(spec, params, batch_stats):
    """Resolve ``torchvision://resnet50`` against local caches (this image
    has no network egress); silently skip if not found."""
    if not spec:
        return params, batch_stats
    candidates = []
    if spec.startswith("torchvision://"):
        name = spec.split("//", 1)[1]
        for root in (os.environ.get("TORCH_HOME", ""),
                     osp.expanduser("~/.cache/torch"),
                     "data/pretrained", "/root/data/pretrained"):
            if root:
                candidates += [
                    osp.join(root, "hub", "checkpoints", f"{name}.pth"),
                    osp.join(root, f"{name}.pth"),
                ]
        import glob
        for root in (osp.expanduser("~/.cache/torch/hub/checkpoints"),
                     "data/pretrained"):
            candidates += sorted(glob.glob(osp.join(root, f"{name}-*.pth")))
    else:
        candidates = [spec]
    for c in candidates:
        if osp.isfile(c):
            sd = import_torch_state_dict(c)
            logger.info("loaded pretrained backbone from %s", c)
            return torchvision_resnet_to_params(sd, params, batch_stats)
    logger.warning("pretrained weights %s not found locally; "
                   "training from random init", spec)
    return params, batch_stats


# ---------------------------------------------------------------------------
# full mmdet / LOFT checkpoint import (bc_v100 parity path)
# ---------------------------------------------------------------------------

def mmdet_checkpoint_to_params(sd, params, batch_stats, roi_feat=7,
                               mask_feat=14):
    """Map an mmdet-v2.3 LOFT checkpoint into our full param tree."""
    params, batch_stats = torchvision_resnet_to_params(
        sd, params, batch_stats, prefix="backbone.")
    nk = params["neck"]
    i = 0
    while f"neck.lateral_convs.{i}.conv.weight" in sd:
        nk[f"lateral_{i}"]["kernel"] = _conv_w(
            sd[f"neck.lateral_convs.{i}.conv.weight"])
        nk[f"lateral_{i}"]["bias"] = np.asarray(
            sd[f"neck.lateral_convs.{i}.conv.bias"])
        nk[f"fpn_{i}"]["kernel"] = _conv_w(
            sd[f"neck.fpn_convs.{i}.conv.weight"])
        nk[f"fpn_{i}"]["bias"] = np.asarray(
            sd[f"neck.fpn_convs.{i}.conv.bias"])
        i += 1
    rp = params["rpn_head"]
    for ours, theirs in (("rpn_conv", "rpn_head.rpn_conv"),
                         ("rpn_cls", "rpn_head.rpn_cls"),
                         ("rpn_reg", "rpn_head.rpn_reg")):
        rp[ours]["kernel"] = _conv_w(sd[theirs + ".weight"])
        rp[ours]["bias"] = np.asarray(sd[theirs + ".bias"])
    bh = params["bbox_head"]
    c = 256
    bh["shared_fc1"]["kernel"] = _fc_w_from_chw(
        sd["roi_head.bbox_head.shared_fcs.0.weight"], c, roi_feat, roi_feat)
    bh["shared_fc1"]["bias"] = np.asarray(
        sd["roi_head.bbox_head.shared_fcs.0.bias"])
    bh["shared_fc2"]["kernel"] = _fc_w(
        sd["roi_head.bbox_head.shared_fcs.1.weight"])
    bh["shared_fc2"]["bias"] = np.asarray(
        sd["roi_head.bbox_head.shared_fcs.1.bias"])
    for ours, theirs in (("fc_cls", "roi_head.bbox_head.fc_cls"),
                         ("fc_reg", "roi_head.bbox_head.fc_reg")):
        bh[ours]["kernel"] = _fc_w(sd[theirs + ".weight"])
        bh[ours]["bias"] = np.asarray(sd[theirs + ".bias"])
    if "mask_head" in params:
        mh = params["mask_head"]
        i = 0
        while f"roi_head.mask_head.convs.{i}.conv.weight" in sd:
            mh[f"conv{i}"]["kernel"] = _conv_w(
                sd[f"roi_head.mask_head.convs.{i}.conv.weight"])
            mh[f"conv{i}"]["bias"] = np.asarray(
                sd[f"roi_head.mask_head.convs.{i}.conv.bias"])
            i += 1
        mh["upsample"]["kernel"] = _deconv_w(
            sd["roi_head.mask_head.upsample.weight"])
        mh["upsample"]["bias"] = np.asarray(
            sd["roi_head.mask_head.upsample.bias"])
        mh["conv_logits"]["kernel"] = _conv_w(
            sd["roi_head.mask_head.conv_logits.weight"])
        mh["conv_logits"]["bias"] = np.asarray(
            sd["roi_head.mask_head.conv_logits.bias"])
    if "offset_head" in params:
        oh = params["offset_head"]
        e = 0
        while f"roi_head.offset_head.expand_convs.{e}.0.weight" in sd:
            j = 0
            while f"roi_head.offset_head.expand_convs.{e}.{j}.weight" in sd:
                oh[f"branch{e}_conv{j}"]["kernel"] = _conv_w(
                    sd[f"roi_head.offset_head.expand_convs.{e}.{j}.weight"])
                oh[f"branch{e}_conv{j}"]["bias"] = np.asarray(
                    sd[f"roi_head.offset_head.expand_convs.{e}.{j}.bias"])
                j += 1
            e += 1
        if "roi_head.offset_head.fcs.0.weight" in sd:    # shared fcs
            oh["fc0"]["kernel"] = _fc_w_from_chw(
                sd["roi_head.offset_head.fcs.0.weight"], c, roi_feat,
                roi_feat)
            oh["fc0"]["bias"] = np.asarray(
                sd["roi_head.offset_head.fcs.0.bias"])
            k = 1
            while f"roi_head.offset_head.fcs.{k}.weight" in sd:
                oh[f"fc{k}"]["kernel"] = _fc_w(
                    sd[f"roi_head.offset_head.fcs.{k}.weight"])
                oh[f"fc{k}"]["bias"] = np.asarray(
                    sd[f"roi_head.offset_head.fcs.{k}.bias"])
                k += 1
            oh["fc_offset"]["kernel"] = _fc_w(
                sd["roi_head.offset_head.fc_offset.weight"])
            oh["fc_offset"]["bias"] = np.asarray(
                sd["roi_head.offset_head.fc_offset.bias"])
    return params, batch_stats
