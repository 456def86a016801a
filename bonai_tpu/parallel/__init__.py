"""Distributed/parallel utilities.

reference: NCCL through torch.distributed — ``init_dist`` launchers
(``tools/train.py:94-98``), DDP gradient sync (``apis/train.py:75-79``),
coalesced allreduce (``core/utils/dist_utils.py:10-51``), eval gather
(``apis/test.py:145-217``), per-rank epoch seeding.

TPU-native mapping (SURVEY.md §2.7):
- process bring-up: ``jax.distributed.initialize()`` (DCN rendezvous)
- data parallelism: ``Mesh(('data',))`` over all chips; grads pmean'd
  over ICI inside the shard_map'd train step (``engine/train_step.py``)
- eval gather: ``multihost_utils.process_allgather``
- seeding: ``jax.random.fold_in(key, process_index)``
"""

from __future__ import annotations

import jax

from ..engine.train_step import make_mesh, device_prefetch


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Initialise multi-host JAX (no-op on a single host).

    On TPU pods the runtime auto-detects everything; args exist for
    GKE-style explicit rendezvous.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


def process_allgather(tree):
    """Gather per-host pytrees to every host (eval collection —
    reference ``collect_results_cpu/gpu``)."""
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(tree)


def fold_in_process(rng):
    return jax.random.fold_in(rng, jax.process_index())


__all__ = ["make_mesh", "device_prefetch", "init_distributed",
           "process_allgather", "fold_in_process"]
