"""OHEM sampler: loss-ranked hard example mining
(reference ``mmdet/core/bbox/samplers/ohem_sampler.py``)."""

import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))


def test_ohem_sample_picks_hardest():
    from bonai_tpu.core.samplers import ohem_sample
    # 12 candidates: 0-3 positives (gt 1..), 4-9 negatives, 10-11 invalid
    assigned = jnp.asarray([1, 2, 1, 2, 0, 0, 0, 0, 0, 0, -1, -1],
                           jnp.int32)
    loss = jnp.asarray([0.9, 0.1, 0.5, 0.3,            # pos losses
                        5.0, 0.2, 4.0, 0.1, 3.0, 0.3,  # neg losses
                        9.9, 9.9])                     # invalid (ignored)
    res = ohem_sample(loss, assigned, num=6, pos_fraction=0.5)
    inds = np.asarray(res["inds"])
    is_pos = np.asarray(res["is_pos"])
    valid = np.asarray(res["valid"])
    assert valid.all()
    assert is_pos.sum() == 3
    # hardest positives by loss: 0 (0.9), 2 (0.5), 3 (0.3)
    assert set(inds[is_pos]) == {0, 2, 3}
    # hardest negatives: 4 (5.0), 6 (4.0), 8 (3.0); never the invalid ones
    assert set(inds[~is_pos]) == {4, 6, 8}
    # positives ranked first (contract shared with random_sample)
    assert is_pos[:3].all() and not is_pos[3:].any()


def test_ohem_sample_pads_when_few_candidates():
    from bonai_tpu.core.samplers import ohem_sample
    assigned = jnp.asarray([1, 0], jnp.int32)
    loss = jnp.asarray([1.0, 2.0])
    res = ohem_sample(loss, assigned, num=8, pos_fraction=0.25)
    assert res["inds"].shape == (8,)
    assert np.asarray(res["valid"]).sum() == 2


def test_loft_trains_with_ohem_sampler():
    from test_models_forward import (tiny_loft_cfg, tiny_train_cfg,
                                     tiny_test_cfg, demo_batch)
    from bonai_tpu.models import build_detector
    tc = tiny_train_cfg()
    tc["rcnn"]["sampler"]["type"] = "OHEMSampler"
    model = build_detector(tiny_loft_cfg(), tc, tiny_test_cfg())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    batch = demo_batch(0)
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    @jax.jit
    def run(p):
        def loss_fn(p):
            losses = model.apply({"params": p, **other}, batch,
                                 method="forward_train",
                                 rngs={"sampling": jax.random.PRNGKey(2)})
            return sum(jnp.sum(v) for v in losses.values()), losses
        return jax.value_and_grad(loss_fn, has_aux=True)(p)

    (total, losses), grads = run(params)
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads["bbox_head"]))
    assert np.isfinite(gnorm) and gnorm > 0
