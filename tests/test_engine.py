import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from bonai_tpu.engine import (build_lr_schedule, build_optimizer,
                              create_train_state, save_checkpoint,
                              load_checkpoint, latest_checkpoint)
from bonai_tpu.engine.optim import frozen_mask_from_model


def test_lr_schedule_warmup_and_steps():
    # reference recipe: warmup 300 iters @ratio 0.001, steps at epoch 16/22
    sch = build_lr_schedule(0.005, steps_per_epoch=100, step_epochs=[16, 22],
                            total_epochs=24, warmup="linear",
                            warmup_iters=300, warmup_ratio=0.001)
    assert abs(float(sch(0)) - 0.005 * 0.001) < 1e-9
    assert abs(float(sch(150)) - 0.005 * (1 - 0.5 * 0.999)) < 1e-7
    assert abs(float(sch(300)) - 0.005) < 1e-9
    assert abs(float(sch(1599)) - 0.005) < 1e-9
    assert abs(float(sch(1600)) - 0.0005) < 1e-9
    assert abs(float(sch(2200)) - 0.00005) < 1e-10


def test_sgd_matches_torch_semantics():
    """Our optax chain must reproduce torch.optim.SGD with momentum+wd."""
    import torch
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g1 = np.array([0.1, 0.2, -0.3], np.float32)
    g2 = np.array([-0.2, 0.1, 0.4], np.float32)
    lr, mom, wd = 0.1, 0.9, 0.01

    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.SGD([tw], lr=lr, momentum=mom, weight_decay=wd)
    for g in (g1, g2):
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()

    sch = build_lr_schedule(lr, 1, [], 1, warmup=None, warmup_iters=0)
    tx = build_optimizer(dict(type="SGD", lr=lr, momentum=mom,
                              weight_decay=wd), sch)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in (g1, g2):
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_grad_clip_global_norm():
    sch = build_lr_schedule(1.0, 1, [], 1, warmup=None, warmup_iters=0)
    tx = build_optimizer(dict(type="SGD", lr=1.0, momentum=0.0,
                              weight_decay=0.0), sch, dict(max_norm=1.0))
    params = {"w": jnp.zeros(4)}
    state = tx.init(params)
    big = {"w": jnp.full(4, 10.0)}          # norm 20
    updates, _ = tx.update(big, state, params)
    assert abs(float(optax.global_norm(updates)) - 1.0) < 1e-5


def test_frozen_mask_and_no_updates():
    params = {"backbone": {"conv1": {"kernel": jnp.ones(3)},
                           "layer1_0": {"conv1": {"kernel": jnp.ones(3)}},
                           "layer2_0": {"conv1": {"kernel": jnp.ones(3)}}},
              "rpn_head": {"w": jnp.ones(3)}}
    mask = frozen_mask_from_model(params, 1)
    assert mask["backbone"]["conv1"]["kernel"] is True
    assert mask["backbone"]["layer1_0"]["conv1"]["kernel"] is True
    assert mask["backbone"]["layer2_0"]["conv1"]["kernel"] is False
    assert mask["rpn_head"]["w"] is False

    sch = build_lr_schedule(0.1, 1, [], 1, warmup=None, warmup_iters=0)
    tx = build_optimizer(dict(type="SGD", lr=0.1, momentum=0.9,
                              weight_decay=0.01), sch, None, mask)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # frozen params receive exactly zero update (no wd either)
    assert float(jnp.abs(updates["backbone"]["conv1"]["kernel"]).sum()) == 0
    assert float(jnp.abs(updates["rpn_head"]["w"]).sum()) > 0


def test_checkpoint_roundtrip(tmp_path):
    sch = build_lr_schedule(0.1, 1, [], 1, warmup=None, warmup_iters=0)
    tx = build_optimizer(dict(type="SGD", lr=0.1, momentum=0.9), sch)
    params = {"w": jnp.arange(4, dtype=jnp.float32)}
    state = create_train_state(params, {"bn": jnp.ones(2)}, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    wd = str(tmp_path)
    save_checkpoint(wd, 7, state, meta={"epoch": 1})
    path = latest_checkpoint(wd)
    assert path and path.endswith("step_7")
    state2 = create_train_state(
        {"w": jnp.zeros(4)}, {"bn": jnp.zeros(2)}, tx)
    state2 = load_checkpoint(path, state2)
    np.testing.assert_allclose(np.asarray(state2.params["w"]),
                               np.arange(4))
    assert int(state2.step) == 7
    np.testing.assert_allclose(np.asarray(state2.batch_stats["bn"]),
                               np.ones(2))


def test_checkpoint_provenance_meta(tmp_path):
    """Checkpoints embed {version+git, config text, CLASSES} like reference
    checkpoints (tools/train.py:140-146) and the config round-trips."""
    from bonai_tpu import Config
    from bonai_tpu.engine.checkpoint import provenance_meta, load_meta
    cfg = Config.fromstring("a = 1\nmodel = dict(type='LOFT')\n")
    meta = provenance_meta(cfg, classes=("building",))
    assert meta["bonai_tpu_version"]
    assert meta["CLASSES"] == ["building"]
    sch = build_lr_schedule(0.1, 1, [], 1, warmup=None, warmup_iters=0)
    tx = build_optimizer(dict(type="SGD", lr=0.1, momentum=0.9), sch)
    state = create_train_state({"w": jnp.zeros(2)}, {}, tx)
    path = save_checkpoint(str(tmp_path), 1, state, meta=meta)
    back = load_meta(path)
    assert back["CLASSES"] == ["building"]
    cfg2 = Config.fromstring(back["config"])
    assert cfg2.model["type"] == "LOFT" and cfg2.a == 1
