"""Optimizer + LR schedule matching the reference training recipe.

reference: ``configs/_base_/schedules/schedule_2x_bonai.py`` (SGD momentum
0.9, wd 1e-4, grad-clip L2 35, linear warmup 300 iters @0.001, steps at
epoch 16/22, 24 epochs) driven by mmcv's OptimizerHook + step LrUpdater.
Here the whole recipe is an optax chain compiled into the train step.

Parity notes (torch.optim.SGD):
- weight decay is added to the gradient *before* the momentum buffer
- the momentum buffer does not include the lr (update = -lr * v)
both are reproduced by the chain order below.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def build_lr_schedule(base_lr, steps_per_epoch, step_epochs, total_epochs,
                      warmup="linear", warmup_iters=500, warmup_ratio=0.001,
                      gamma=0.1):
    """Step policy with iteration-level linear warmup (mmcv semantics:
    ``lr = base * (1 - (1 - i/warmup_iters) * (1 - warmup_ratio))``)."""
    boundaries = [e * steps_per_epoch for e in step_epochs]

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        decay = jnp.asarray(1.0, jnp.float32)
        for b in boundaries:
            decay = decay * jnp.where(count >= b, gamma, 1.0)
        lr = base_lr * decay
        if warmup == "linear" and warmup_iters > 0:
            k = (1.0 - count / warmup_iters) * (1.0 - warmup_ratio)
            warm = base_lr * (1.0 - k)
            lr = jnp.where(count < warmup_iters, warm, lr)
        return lr

    return schedule


def build_optimizer(optimizer_cfg, lr_schedule, grad_clip=None,
                    frozen_mask=None):
    """Build the optax chain from reference-format config dicts.

    Args:
      optimizer_cfg: ``dict(type='SGD', lr=..., momentum=..., weight_decay=)``
      lr_schedule: callable step -> lr.
      grad_clip: ``dict(max_norm=35, norm_type=2)`` or None.
      frozen_mask: pytree of bools (True = frozen); frozen params receive
        no update and no weight decay (reference ``requires_grad=False``).
    """
    cfg = dict(optimizer_cfg)
    opt_type = cfg.get("type", "SGD")
    momentum = cfg.get("momentum", 0.9)
    wd = cfg.get("weight_decay", 0.0)
    # reference paramwise_cfg (mmcv DefaultOptimizerConstructor):
    # norm_decay_mult=0 exempts norm scale/bias from weight decay
    # (scratch configs).  Norm params are exactly the 1-D 'scale' leaves
    # and their sibling 'bias' (convs/denses use 'kernel').
    pw = dict(cfg.get("paramwise_cfg") or {})
    no_norm_decay = wd and pw.get("norm_decay_mult", 1.0) == 0.0

    def _norm_exempt_mask(params):
        def rec(tree):
            if not isinstance(tree, dict):
                return True
            is_norm = "scale" in tree and not isinstance(
                tree["scale"], dict) and getattr(
                    tree["scale"], "ndim", None) == 1
            return {k: (not (is_norm and k in ("scale", "bias")))
                    if not isinstance(v, dict) else rec(v)
                    for k, v in tree.items()}
        return rec(params)

    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip.get("max_norm", 35)))
    if wd:
        if frozen_mask is not None:
            if no_norm_decay:
                nf = jax.tree_util.tree_map(lambda f: not f, frozen_mask)

                def mask_fn(params, nf=nf):
                    return jax.tree_util.tree_map(
                        lambda a, b: a and b, _norm_exempt_mask(params), nf)
                chain.append(optax.add_decayed_weights(wd, mask=mask_fn))
            else:
                not_frozen = jax.tree_util.tree_map(lambda f: not f,
                                                    frozen_mask)
                chain.append(optax.add_decayed_weights(wd, mask=not_frozen))
        elif no_norm_decay:
            chain.append(optax.add_decayed_weights(
                wd, mask=_norm_exempt_mask))
        else:
            chain.append(optax.add_decayed_weights(wd))
    if opt_type == "SGD":
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=False))
    elif opt_type in ("Adam", "AdamW"):
        # reference Adam (CornerNet recipe) / AdamW; decoupled decay is
        # applied above when weight_decay is set
        chain.append(optax.scale_by_adam())
    else:
        raise KeyError(f"unsupported optimizer type {opt_type}")
    chain.append(optax.scale_by_learning_rate(lr_schedule))
    tx = optax.chain(*chain)
    if frozen_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            jax.tree_util.tree_map(
                lambda f: "frozen" if f else "train", frozen_mask))
    return tx


def frozen_mask_from_model(params, backbone_frozen_stages):
    """Mark backbone params frozen per reference ``_freeze_stages``
    (reference ``mmdet/models/backbones/resnet.py:604-621``)."""
    prefixes = []
    if backbone_frozen_stages >= 0:
        prefixes += ["conv1", "bn1"]
    for s in range(1, backbone_frozen_stages + 1):
        prefixes.append(f"layer{s}_")

    def mark(path, _):
        names = [str(getattr(p, "key", p)) for p in path]
        if "backbone" not in names:
            return False
        # only the module name directly under `backbone` decides: the stem
        # conv1/bn1 live at backbone/conv1, while every bottleneck block
        # also has an inner conv1 (backbone/layerX_Y/conv1) that must NOT
        # match the stem prefix.
        child = names[names.index("backbone") + 1]
        return any(child.startswith(p) for p in prefixes)

    return jax.tree_util.tree_map_with_path(mark, params)
