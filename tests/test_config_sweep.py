"""Config-build sweep: every shipped config must build a detector with a
complete parameter structure (the reference's de-facto integration test —
``tests/test_config.py:24-76``).  Uses eval_shape so no real compute runs.
"""

import glob
import os.path as osp

import jax
import jax.numpy as jnp
import pytest

from bonai_tpu import Config
from bonai_tpu.models import build_detector

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
CONFIGS = sorted(
    p for p in glob.glob(osp.join(REPO, "configs", "**", "*.py"),
                         recursive=True)
    if "_base_" not in p)


@pytest.mark.parametrize("path", CONFIGS, ids=[osp.basename(p)[:-3]
                                               for p in CONFIGS])
def test_config_builds_detector(path):
    cfg = Config.fromfile(path)
    model = build_detector(cfg.model, cfg.get("train_cfg"),
                           cfg.get("test_cfg"))
    # fixed-input families (SSD300/512, CornerNet) can't trace at 64^2
    size = int(dict(cfg.model.get("backbone") or {}).get("input_size", 64))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, size, size, 3)))
    params = shapes["params"]
    assert "backbone" in params
    n = sum(int(jnp.prod(jnp.asarray(x.shape)))
            for x in jax.tree_util.tree_leaves(params))
    assert n > 1e6

    # optimizer builds from the schedule config
    from bonai_tpu.engine import build_lr_schedule, build_optimizer
    opt = dict(cfg.optimizer)
    lr_cfg = dict(cfg.get("lr_config", {}))
    sch = build_lr_schedule(opt.get("lr", 0.01), 100,
                            list(lr_cfg.get("step", [])), 12,
                            warmup=lr_cfg.get("warmup"),
                            warmup_iters=lr_cfg.get("warmup_iters", 0))
    grad_clip = dict(cfg.get("optimizer_config", {}).get("grad_clip") or {})
    tx = build_optimizer(opt, sch, grad_clip or None)
    assert tx is not None


def test_all_configs_have_data_and_schedule():
    for path in CONFIGS:
        cfg = Config.fromfile(path)
        assert "data" in cfg, path
        assert "optimizer" in cfg, path
        assert "total_epochs" in cfg, path
