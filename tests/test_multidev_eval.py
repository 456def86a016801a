"""Multi-device eval: SPMD simple_test over an 8-device mesh preserves
batch order and values; sharded-loader results merge back into dataset
order (reference ``multi_gpu_test`` + ``collect_results_cpu``,
``mmdet/apis/test.py:82-184``)."""

import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from test_models_forward import (tiny_loft_cfg, tiny_train_cfg,
                                 tiny_test_cfg)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_mesh_eval_matches_single_device_order():
    from bonai_tpu.models import build_detector
    from bonai_tpu.engine.train_step import make_mesh, make_eval_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    model = build_detector(tiny_loft_cfg(), tiny_train_cfg(),
                           tiny_test_cfg())
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    r = np.random.RandomState(0)
    img = jnp.asarray(r.randn(8, 64, 64, 3), jnp.float32)
    shape = jnp.full((8, 2), 64.0)
    sf = jnp.ones((8,))

    single = jax.jit(lambda v, i, s, f: model.apply(
        v, i, s, f, method="simple_test"))
    out_1 = jax.device_get(single(variables, img, shape, sf))

    mesh = make_mesh(8)
    step = make_eval_step(model, mesh=mesh)
    sharding = NamedSharding(mesh, P("data"))
    out_8 = jax.device_get(step(
        variables, jax.device_put(img, sharding),
        jax.device_put(shape, sharding), jax.device_put(sf, sharding)))

    assert out_1.keys() == out_8.keys()
    for k in out_1:
        np.testing.assert_allclose(np.asarray(out_1[k], np.float32),
                                   np.asarray(out_8[k], np.float32),
                                   rtol=2e-3, atol=2e-3, err_msg=k)


def test_shard_indices_cover_and_interleave():
    from bonai_tpu.datasets.builder import DataLoader

    class _Fake:
        def __len__(self):
            return 10

    shards = []
    for s in range(4):
        dl = DataLoader(_Fake(), batch_size=1, shuffle=False, train=False,
                        drop_last=False, shard_id=s, num_shards=4)
        shards.append(list(dl._epoch_indices()))
    lens = {len(s) for s in shards}
    assert lens == {3}                      # wrap-padded to equal length
    covered = set()
    for s in shards:
        covered.update(int(i) for i in s)
    assert covered == set(range(10))        # nothing dropped

    from bonai_tpu.parallel import collect_results_shards
    merged = collect_results_shards(shards, total=10, num_shards=4)
    assert [int(i) for i in merged] == list(range(10))


def test_collect_results_single_process_passthrough():
    from bonai_tpu.parallel import collect_results_shards
    out = collect_results_shards(["a", "b", "c", "a"], total=3,
                                 num_shards=1)
    assert out == ["a", "b", "c"]
