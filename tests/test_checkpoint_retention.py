"""Checkpoint retention (``max_keep_ckpts``) and preemption safety.

reference: mmcv ``CheckpointHook`` (used via
``configs/_base_/default_runtime.py:1``) keeps the newest
``max_keep_ckpts`` checkpoints; a save killed mid-write must never
break resume — ``latest_checkpoint`` has to keep pointing at the last
fully-committed save.
"""

import os
import os.path as osp
import sys

import jax
import jax.numpy as jnp
import optax
import pytest

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from bonai_tpu.engine import (create_train_state, latest_checkpoint,
                              load_checkpoint, save_checkpoint)


def _tiny_state(value=0.0, step=0):
    params = {"w": jnp.full((4,), value)}
    tx = optax.sgd(0.1)
    state = create_train_state(params, {}, tx)
    return state.replace(step=jnp.asarray(step, jnp.int32))


def test_max_keep_prunes_oldest(tmp_path):
    wd = str(tmp_path)
    for i, step in enumerate([10, 20, 30, 40]):
        save_checkpoint(wd, step, _tiny_state(float(i), step), max_keep=2)
    kept = sorted(os.listdir(osp.join(wd, "checkpoints")))
    assert kept == ["step_30", "step_40"]
    assert latest_checkpoint(wd).endswith("step_40")


def test_no_max_keep_keeps_everything(tmp_path):
    wd = str(tmp_path)
    for step in (1, 2, 3):
        save_checkpoint(wd, step, _tiny_state(0.0, step))
    assert len(os.listdir(osp.join(wd, "checkpoints"))) == 3


def test_torn_save_skipped_and_last_good_loads(tmp_path):
    """A kill mid-save leaves a step dir without orbax's commit marker;
    latest_checkpoint must skip it and the previous save must load."""
    wd = str(tmp_path)
    good = _tiny_state(7.0, 100)
    save_checkpoint(wd, 100, good, meta={"epoch": 1})

    # simulate a torn save: the dir exists, some payload bytes exist,
    # but the _CHECKPOINT_METADATA commit marker was never written
    torn = osp.join(wd, "checkpoints", "step_200", "state")
    os.makedirs(osp.join(torn, "ocdbt.process_0"))
    with open(osp.join(torn, "manifest.ocdbt"), "wb") as f:
        f.write(b"\x00partial")

    path = latest_checkpoint(wd)
    assert path is not None and path.endswith("step_100")

    restored = load_checkpoint(path, _tiny_state(0.0, 0))
    assert int(restored.step) == 100
    assert float(restored.params["w"][0]) == pytest.approx(7.0)


def test_torn_save_never_counted_for_pruning(tmp_path):
    """Pruning counts only finalized saves: a torn dir must not cause a
    good checkpoint to be deleted in its place."""
    wd = str(tmp_path)
    save_checkpoint(wd, 10, _tiny_state(1.0, 10), max_keep=2)
    torn = osp.join(wd, "checkpoints", "step_15", "state")
    os.makedirs(torn)
    save_checkpoint(wd, 20, _tiny_state(2.0, 20), max_keep=2)
    save_checkpoint(wd, 30, _tiny_state(3.0, 30), max_keep=2)
    kept = sorted(d for d in os.listdir(osp.join(wd, "checkpoints")))
    assert "step_20" in kept and "step_30" in kept
    assert "step_10" not in kept
