"""C4 shared-head (ResLayer) RoI path: the res5 stage runs on RoI
features, the bbox head avg-pools it, and the mask branch reuses the
SAME res5 features instead of its own extractor.

reference: ``mmdet/models/roi_heads/shared_heads/res_layer.py`` +
``configs/_base_/models/mask_rcnn_r50_caffe_c4.py`` (shared_head /
with_avg_pool / mask_roi_extractor=None) +
``standard_roi_head.py`` ``_mask_forward`` share_roi_extractor path.
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

from test_config_forward_sweep import _shrink, sweep_batch
from test_forward_tiny_sweep import shrink_widths

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _build_c4(name):
    cfg = Config.fromfile(
        osp.join(REPO, "configs", "mask_rcnn" if "mask" in name
                 else "faster_rcnn", name))
    model_cfg = shrink_widths(dict(cfg.model))
    train_cfg = dict(cfg.get("train_cfg"))
    test_cfg = dict(cfg.get("test_cfg"))
    _shrink(train_cfg)
    _shrink(test_cfg)
    return build_detector(model_cfg, train_cfg, test_cfg), model_cfg


def test_mask_c4_forward_train_and_test():
    model, model_cfg = _build_c4("mask_rcnn_r50_caffe_c4_1x_coco.py")
    size = 96
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)))
    params = variables["params"]
    # the shared res5 head exists exactly once and owns the final-stage
    # bottleneck weights; the mask head has no extractor of its own
    assert "shared_head" in params
    assert any(k.startswith("layer4") for k in params["shared_head"])
    batch = sweep_batch(size)
    losses = model.apply(variables, batch, method=model.forward_train,
                         rngs={"sampling": jax.random.PRNGKey(1)})
    total = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(losses))
    assert np.isfinite(float(total))
    assert any("mask" in k for k in losses), sorted(losses)

    out = model.apply(variables, batch["image"], batch["img_shape"],
                      jnp.ones((1,)), method=model.simple_test)
    assert "det_bboxes" in out and "mask_probs" in out
    assert np.all(np.isfinite(np.asarray(out["det_bboxes"],
                                         np.float32)))


def test_faster_c4_forward_train():
    model, _ = _build_c4("faster_rcnn_r50_caffe_c4_1x_coco.py")
    size = 96
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)))
    assert "shared_head" in variables["params"]
    # mask-less C4: no mask head params
    assert "mask_head" not in variables["params"]
    batch = sweep_batch(size)
    losses = model.apply(variables, batch, method=model.forward_train,
                         rngs={"sampling": jax.random.PRNGKey(1)})
    total = sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(losses))
    assert np.isfinite(float(total))
