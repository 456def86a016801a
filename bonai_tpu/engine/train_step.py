"""Compiled train / eval steps with data parallelism over a device mesh.

reference parallel semantics: ``MMDistributedDataParallel`` gradient
all-reduce + per-rank loss normalisation (``mmdet/apis/train.py:75-79``,
``core/utils/dist_utils.py:10-51``).  TPU-native equivalent: one
``shard_map`` over ``Mesh(('data',))`` — per-shard losses are normalised
locally (matching per-GPU DDP semantics) and gradients are ``pmean``-ed
over ICI; the optimizer update then runs replicated.  No DDP object, no
bucketing: XLA fuses and overlaps the collectives with the backward pass.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map as _shard_map_impl
except ImportError:                      # older jax
    from jax.experimental.shard_map import shard_map as _shard_map_impl


def shard_map(f, mesh, in_specs, out_specs):
    """API-compat wrapper: replication checking kwarg was renamed/removed
    across jax versions (check_rep -> check_vma -> gone)."""
    for kwargs in (dict(check_vma=False), dict(check_rep=False), {}):
        try:
            return _shard_map_impl(f, mesh=mesh, in_specs=in_specs,
                                   out_specs=out_specs, **kwargs)
        except TypeError:
            continue
    raise TypeError("no compatible shard_map signature found")

from .train_state import TrainState


def make_train_step(model, tx, mesh=None, axis_name="data", donate=True,
                    lr_schedule=None, img_norm=None, donate_batch=False):
    """Build the compiled train step ``(state, batch, rng) -> (state, metrics)``.

    With a mesh, the step is shard_map'd: batch sharded over ``axis_name``,
    state replicated, gradients pmean'd.  Without a mesh it is a plain jit
    (single device).

    ``img_norm``: optional ``dict(mean=(3,), std=(3,))`` — the deferred
    half of ``Normalize(device=True)``: uint8 images cross the tunnel
    raw and are normalised here, fused into the compiled step.

    ``donate_batch``: also donate the batch buffers.  The training loop
    sends a FRESH batch every step, so its input buffers are dead after
    the step; donating lets the runtime release/reuse them immediately —
    on the tunneled TPU platform, host-side transfer buffers were
    observed to accumulate ~40 MB/step without this (round-5 OOM
    post-mortem).  Leave False when the same batch object is reused
    across calls (bench.py's chained timing).
    """
    n_mean = n_std = None
    if img_norm is not None:
        n_mean = jnp.asarray(img_norm["mean"], jnp.float32)
        n_std = jnp.asarray(img_norm["std"], jnp.float32)

    def loss_fn(params, batch_stats, batch, rng):
        if batch["image"].dtype == jnp.uint8:
            batch = dict(batch)
            img = batch["image"].astype(jnp.float32)
            if n_mean is not None:
                img = (img - n_mean) / n_std
            batch["image"] = img
            if "gt_masks" in batch and batch["gt_masks"].dtype == jnp.uint8:
                batch["gt_masks"] = batch["gt_masks"].astype(jnp.bfloat16)
        losses = model.apply({"params": params, "batch_stats": batch_stats},
                             batch, method="forward_train",
                             rngs={"sampling": rng})
        # "stat_*" entries are training statistics riding along for the
        # host loop (Dynamic R-CNN hyperparameter updates), not losses
        total = sum(jnp.asarray(v, jnp.float32)
                    for k, v in losses.items() if not k.startswith("stat_"))
        return total, losses

    def local_step(state, batch, rng):
        if mesh is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        rng = jax.random.fold_in(rng, state.step)
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng)
        if mesh is not None:
            grads = jax.lax.pmean(grads, axis_name)
            total = jax.lax.pmean(total, axis_name)
            losses = jax.lax.pmean(losses, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  step=state.step + 1)
        return new_state, metrics

    dargs = (0,) if donate else ()
    if donate_batch:
        dargs = dargs + (1,)
    if mesh is None:
        return jax.jit(local_step, donate_argnums=dargs)

    mapped = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(axis_name), P()),
        out_specs=(P(), P()))
    return jax.jit(mapped, donate_argnums=dargs)


def make_eval_step(model, mesh=None, axis_name="data"):
    """Compiled inference step ``(variables, image, img_shape, scale) ->
    padded detection dict`` (device part of ``simple_test``)."""

    def local_eval(variables, image, img_shape, scale_factor):
        return model.apply(variables, image, img_shape, scale_factor,
                           method="simple_test")

    if mesh is None:
        return jax.jit(local_eval)
    mapped = shard_map(local_eval, mesh=mesh,
                       in_specs=(P(), P(axis_name), P(axis_name),
                                 P(axis_name)),
                       out_specs=P(axis_name))
    return jax.jit(mapped)


def device_prefetch(iterator, mesh=None, axis_name="data", size=2):
    """Move batches to device ahead of consumption (double-buffering the
    H2D transfer off the step's critical path — profiled at ~24 ms/step
    for the instance-mask tensors otherwise)."""
    import collections
    buf = collections.deque()
    sharding = None
    if mesh is not None:
        sharding = NamedSharding(mesh, P(axis_name))

    def put(item):
        batch, meta = item
        # ship instance masks as bf16: u8 device layout conversion runs on
        # the scalar core (profiled at ~24ms for 2.5MB); bf16 is vectorized.
        # EXCEPT in uint8-image (tunnel-optimised) mode, where halving the
        # bytes on the wire beats the on-device relayout cost
        if "gt_masks" in batch and batch.get(
                "image", np.zeros(1)).dtype != np.uint8:
            batch = dict(batch)
            batch["gt_masks"] = jnp.asarray(batch["gt_masks"], jnp.bfloat16)
        if sharding is not None:
            batch = {k: jax.device_put(v, sharding)
                     for k, v in batch.items()}
        else:
            batch = {k: jax.device_put(v) for k, v in batch.items()}
        return batch, meta

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out


def make_mesh(n_devices=None, axis_name="data"):
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np
    return Mesh(np.array(devices), (axis_name,))
