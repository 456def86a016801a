"""Default-suite forward tier: one REAL forward_train per config family
at SHRUNK widths (depth-18 trunk, 64-channel neck/heads), 96px input.

Complements the env-gated full-width sweep (test_config_forward_sweep.py,
``BONAI_FORWARD_SWEEP=1``): this tier always runs, so every family's
numeric forward path is exercised by plain ``pytest tests/`` (VERDICT r4
directive 3).  Width shrinking touches only capacity knobs — the
structural axes under test (DCN stages, GCB plugins, GA heads, transform
methods, deform pools, caffe style, extra-conv modes) are preserved.
"""

import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from bonai_tpu import Config
from bonai_tpu.models import build_detector

from test_config_forward_sweep import (EXCLUDE, family_exemplars,
                                       sweep_batch, _shrink)

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

# heavier structures that don't fit the tiny tier's time budget on the
# 1-core CI host; their forward paths are covered by dedicated tests
# (test_cornernet, test_ssd, test_detectors_rs, test_point_rend, ...)
TINY_EXCLUDE = EXCLUDE | {"detectors", "nas_fcos", "nas_fpn",
                          "point_rend", "grid_rcnn", "instaboost",
                          "albu_example"}

C18 = [64, 128, 256, 512]


def shrink_widths(model):
    """In-place capacity shrink of a reference-format model cfg."""
    bk = model.get("backbone") or {}
    if bk.get("type", "ResNet") in ("ResNet", "ResNeXt", "Res2Net",
                                    "DetectoRS_ResNet"):
        if bk.get("type", "ResNet") == "ResNet" and not bk.get("dcn") \
                and not bk.get("plugins"):
            bk["depth"] = 18
            chans = C18[:len(bk.get("out_indices", (0, 1, 2, 3)))]
        else:
            # keep bottleneck depth (DCN/GCB/ResNeXt live on Bottleneck)
            bk["depth"] = 50
            chans = [256, 512, 1024, 2048]
        model["backbone"] = bk
    else:
        chans = None
    for key in ("neck",):
        nk = model.get(key)
        nks = nk if isinstance(nk, (list, tuple)) else [nk]
        for n in nks:
            if not isinstance(n, dict):
                continue
            if chans is not None and "in_channels" in n and \
                    isinstance(n["in_channels"], (list, tuple)):
                n["in_channels"] = chans[:len(n["in_channels"])]
            if "out_channels" in n:
                n["out_channels"] = 64
            if "in_channels" in n and isinstance(n["in_channels"], int):
                n["in_channels"] = 64

    def shrink_head(h):
        if not isinstance(h, dict):
            return
        for k in ("in_channels", "feat_channels", "conv_out_channels",
                  "point_feat_channels"):
            if k in h and isinstance(h[k], int) and h[k] > 64:
                h[k] = 64
        for k in ("fc_out_channels", "deform_fc_channels"):
            if k in h and isinstance(h[k], int) and h[k] > 128:
                h[k] = 128
        if "stacked_convs" in h and isinstance(h["stacked_convs"], int):
            h["stacked_convs"] = min(h["stacked_convs"], 2)
        for v in h.values():
            if isinstance(v, dict):
                shrink_head(v)
            elif isinstance(v, (list, tuple)):
                for x in v:
                    if isinstance(x, dict):
                        shrink_head(x)

    for key in ("bbox_head", "rpn_head", "roi_head"):
        if model.get(key):
            h = dict(model[key])
            shrink_head(h)
            model[key] = h
    return model


FAMS = [(f, p) for f, p in family_exemplars() if f not in TINY_EXCLUDE]


@pytest.mark.parametrize("fam,path", FAMS, ids=[f for f, _ in FAMS])
def test_family_forward_tiny(fam, path):
    cfg = Config.fromfile(path)
    model_cfg = shrink_widths(dict(cfg.model))
    train_cfg = cfg.get("train_cfg")
    if train_cfg is not None:
        train_cfg = dict(train_cfg)
        _shrink(train_cfg)
    test_cfg = cfg.get("test_cfg")
    if test_cfg is not None:
        test_cfg = dict(test_cfg)
        _shrink(test_cfg)
    model = build_detector(model_cfg, train_cfg, test_cfg)
    size = 96
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)))
    batch = sweep_batch(size)
    if model_cfg.get("type") == "FastRCNN":
        # proposal-based detector: external proposals replace the RPN
        batch["proposals"] = batch["gt_bboxes"]
        batch["proposals_valid"] = batch["gt_valid"]
    losses = jax.jit(lambda v, b: model.apply(
        v, b, method="forward_train",
        rngs={"sampling": jax.random.PRNGKey(1)}))(variables, batch)
    assert losses, path
    for k, v in losses.items():
        val = float(jnp.sum(v))
        assert np.isfinite(val), (fam, k, val)
