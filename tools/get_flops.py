#!/usr/bin/env python
"""Model FLOPs/params via XLA cost analysis (reference:
``tools/get_flops.py`` uses a torch flops counter over ``forward_dummy``)."""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from bonai_tpu import Config


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    parser.add_argument("--shape", type=int, nargs="+", default=[1024, 1024])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from bonai_tpu.models import build_detector

    cfg = Config.fromfile(args.config)
    model = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    n_params = sum(np.prod(x.shape) for x in
                   jax.tree_util.tree_leaves(variables["params"]))

    h, w = (args.shape * 2)[:2]
    img = jnp.zeros((1, h, w, 3))
    lowered = jax.jit(lambda v, x: model.apply(v, x)).lower(variables, img)
    compiled = lowered.compile()
    try:
        flops = compiled.cost_analysis()["flops"]
    except (KeyError, TypeError, IndexError):
        flops = float("nan")
    print(f"Input shape: (1, {h}, {w}, 3)")
    print(f"Params: {n_params / 1e6:.2f} M")
    print(f"FLOPs (forward_dummy, XLA cost analysis): {flops / 1e9:.2f} G")


if __name__ == "__main__":
    main()
