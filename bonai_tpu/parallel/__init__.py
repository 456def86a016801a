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


def collect_results_shards(local_results, total, num_shards=None,
                           shard_id=None):
    """Merge per-shard eval result lists back into dataset order.

    The eval loader gives shard ``s`` the wrap-padded indices
    ``padded[s::num_shards]`` (``datasets/builder.py:_epoch_indices``),
    so global position ``j * num_shards + s`` holds shard ``s``'s ``j``-th
    result; the wrap padding falls off the truncation to ``total``.
    This is the reference's ``collect_results_cpu`` interleave-unshard +
    truncate (``mmdet/apis/test.py:145-184``) without the tmpdir dance:
    object payloads ride ``process_allgather`` as padded pickle bytes.

    Single-process callers can pass lists of per-shard lists directly
    (``local_results`` = list-of-lists) for a pure-host merge.
    """
    import numpy as np
    if num_shards is None:
        num_shards = jax.process_count()
    if isinstance(local_results, list) and local_results and \
            isinstance(local_results[0], list):
        shards = local_results              # pre-gathered (tests)
    elif num_shards == 1:
        return list(local_results)[:total]
    else:
        import pickle
        payload = pickle.dumps(local_results)
        sizes = process_allgather(np.asarray([len(payload)], np.int64))
        maxlen = int(np.max(sizes))
        buf = np.zeros(maxlen, np.uint8)
        buf[:len(payload)] = np.frombuffer(payload, np.uint8)
        gathered = process_allgather(buf)
        gathered = np.asarray(gathered).reshape(num_shards, maxlen)
        shards = [pickle.loads(gathered[s, :int(sizes[s])].tobytes())
                  for s in range(num_shards)]
    merged = []
    per = max(len(s) for s in shards)
    for j in range(per):
        for s in range(len(shards)):
            if j < len(shards[s]):
                merged.append(shards[s][j])
    return merged[:total]


__all__ = ["make_mesh", "device_prefetch", "init_distributed",
           "process_allgather", "fold_in_process",
           "collect_results_shards"]
