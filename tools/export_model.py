#!/usr/bin/env python
"""Export a trained detector's inference function as serialized
StableHLO (jax.export) plus a params msgpack — the TPU-native analog of
the reference's ``tools/pytorch2onnx.py`` (ONNX has no TPU runtime; a
StableHLO artifact reloads into any JAX/XLA runtime, CPU or TPU,
without the python model code).

Usage:
  python tools/export_model.py CONFIG CKPT OUT_PREFIX [--size 1024]
    [--batch 1]

Writes OUT_PREFIX.stablehlo (serialized exported call: params + image ->
det/mask/offset dict) and OUT_PREFIX.params.msgpack.

Reload:
  from jax import export
  exp = export.deserialize(open("model.stablehlo", "rb").read())
  out = exp.call(params, images)
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("out_prefix")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    import flax.serialization as fser

    from bonai_tpu import Config
    from bonai_tpu.engine.checkpoint import load_params_only
    from bonai_tpu.models import build_detector

    cfg = Config.fromfile(args.config)
    model = build_detector(cfg.model, cfg.get("train_cfg"),
                           cfg.get("test_cfg"),
                           compute_dtype=cfg.get("compute_dtype",
                                                 "bfloat16"))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
    params, batch_stats = variables["params"], variables.get(
        "batch_stats", {})
    if args.checkpoint not in ("none", "-"):
        params, batch_stats = load_params_only(args.checkpoint)

    b, s = args.batch, args.size

    def infer(params, batch_stats, img):
        shp = jnp.full((img.shape[0], 2), float(s))
        sf = jnp.ones((img.shape[0],))
        return model.apply({"params": params, "batch_stats": batch_stats},
                           img, shp, sf, method="simple_test")

    exp = jexport.export(jax.jit(infer))(
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params),
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch_stats),
        jax.ShapeDtypeStruct((b, s, s, 3), jnp.float32))
    blob = exp.serialize()
    with open(args.out_prefix + ".stablehlo", "wb") as f:
        f.write(blob)
    with open(args.out_prefix + ".params.msgpack", "wb") as f:
        f.write(fser.to_bytes({"params": params,
                               "batch_stats": batch_stats}))
    print(f"wrote {args.out_prefix}.stablehlo ({len(blob)} bytes) and "
          f"{args.out_prefix}.params.msgpack")


if __name__ == "__main__":
    main()
