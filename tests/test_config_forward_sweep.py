"""Forward-smoke tier: one REAL forward_train step per config family at the
family's configured structure (production depths/widths), small input.

The build sweep (test_config_sweep.py) only proves configs build; this tier
proves each family's numeric forward path at its configured widths
(VERDICT r3 weak #5).  Compile-dominated on the 1-core host, so it is
env-gated: run with ``BONAI_FORWARD_SWEEP=1 pytest tests/test_config_forward_
sweep.py``.  The persistent XLA compile cache (conftest) makes re-runs fast.
"""

import glob
import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu import Config
from bonai_tpu.models import build_detector

pytestmark = pytest.mark.skipif(
    os.environ.get("BONAI_FORWARD_SWEEP") != "1",
    reason="slow forward sweep; set BONAI_FORWARD_SWEEP=1")

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

# families proven on real hardware (STATUS round-3 CLI training runs) or
# needing fixed large inputs that don't compile in CI time on 1 CPU core
EXCLUDE = {"cornernet", "ssd", "legacy_1.x"}


def family_exemplars():
    fams = {}
    for path in sorted(glob.glob(osp.join(REPO, "configs", "*", "*.py"))):
        fam = osp.basename(osp.dirname(path))
        if fam.startswith("_") or fam in EXCLUDE:
            continue
        name = osp.basename(path)
        # prefer the plain r50 1x exemplar
        score = (("r50" in name) * 2 + ("1x" in name)
                 - ("caffe" in name) - ("mstrain" in name))
        cur = fams.get(fam)
        if cur is None or score > cur[0]:
            fams[fam] = (score, path)
    return [(f, p) for f, (s, p) in sorted(fams.items())]


FAMS = family_exemplars()


def _shrink(d):
    """Shrink runtime knobs (proposal counts, sampler sizes) in-place
    without touching the model structure."""
    if not isinstance(d, dict):
        return
    for k, v in list(d.items()):
        if k in ("nms_pre", "nms_post", "max_num"):
            d[k] = min(int(v), 96)
        elif k == "num" and isinstance(v, int) and v > 64:
            d[k] = 48
        elif k == "max_per_img":
            d[k] = min(int(v), 16)
        elif isinstance(v, dict):
            _shrink(v)
        elif isinstance(v, (list, tuple)):
            for x in v:
                _shrink(x) if isinstance(x, dict) else None


def sweep_batch(size, b=1, g=6, m=28):
    r = np.random.RandomState(0)
    xy1 = r.uniform(0, size * 0.5, (b, g, 2))
    wh = r.uniform(10, size * 0.35, (b, g, 2))
    boxes = np.concatenate([xy1, np.minimum(xy1 + wh, size - 1)], -1)
    return {
        "image": jnp.asarray(r.randn(b, size, size, 3), jnp.float32),
        "img_shape": jnp.full((b, 2), float(size)),
        "gt_bboxes": jnp.asarray(boxes, jnp.float32),
        "gt_labels": jnp.zeros((b, g), jnp.int32),
        "gt_valid": jnp.ones((b, g), bool),
        "gt_masks": jnp.asarray((r.rand(b, g, m, m) > 0.4), jnp.uint8),
        "gt_offsets": jnp.asarray(r.uniform(-10, 10, (b, g, 2)),
                                  jnp.float32),
        "gt_semantic_seg": jnp.zeros((b, size // 8, size // 8), jnp.int32),
    }


@pytest.mark.parametrize("fam,path", FAMS, ids=[f for f, _ in FAMS])
def test_family_forward_train(fam, path):
    cfg = Config.fromfile(path)
    train_cfg = cfg.get("train_cfg")
    if train_cfg is not None:
        train_cfg = dict(train_cfg)
        _shrink(train_cfg)
    test_cfg = cfg.get("test_cfg")
    if test_cfg is not None:
        test_cfg = dict(test_cfg)
        _shrink(test_cfg)
    model = build_detector(cfg.model, train_cfg, test_cfg)
    size = 128
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)))
    batch = sweep_batch(size)
    if dict(cfg.model).get("type") == "FastRCNN":
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
