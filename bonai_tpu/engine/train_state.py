"""Train state pytree (replaces mmcv's Runner object state).

reference: the EpochBasedRunner carries model/optimizer/epoch/iter
(``mmdet/apis/train.py:85-143``); here that state is one pytree threaded
through a pure, compiled train step.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    batch_stats: Any
    step: jax.Array


def create_train_state(params, batch_stats, tx):
    import jax.numpy as jnp
    return TrainState(params=params, opt_state=tx.init(params),
                      batch_stats=batch_stats,
                      step=jnp.zeros((), jnp.int32))
