#!/usr/bin/env python
"""Strip optimizer state from a checkpoint for release (reference:
``tools/publish_model.py`` — drops optimizer, appends content hash)."""

import argparse
import hashlib
import os.path as osp
import shutil
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("in_ckpt", help="orbax checkpoint dir (step_N)")
    parser.add_argument("out_ckpt", help="output dir prefix")
    args = parser.parse_args()

    import optax
    import orbax.checkpoint as ocp

    ckpter = ocp.StandardCheckpointer()
    restored = ckpter.restore(osp.join(args.in_ckpt, "state"))
    published = {"params": restored["params"],
                 "batch_stats": restored.get("batch_stats", {}),
                 "step": restored.get("step", 0)}
    tmp = args.out_ckpt + "_tmp"
    ckpter.save(osp.join(tmp, "state"), published, force=True)
    ckpter.wait_until_finished()
    # content hash over the serialized tree for the reference's -{hash}
    # suffix convention
    digest = hashlib.sha256()
    import json
    import numpy as np
    import jax
    for leaf in jax.tree_util.tree_leaves(published["params"]):
        digest.update(np.asarray(leaf).tobytes()[:65536])
    suffix = digest.hexdigest()[:8]
    # provenance meta (config text / CLASSES / version) rides along so the
    # published checkpoint is loadable without its config
    src_meta = osp.join(args.in_ckpt, "meta.json")
    if osp.isfile(src_meta):
        shutil.copy(src_meta, osp.join(tmp, "meta.json"))
    final = f"{args.out_ckpt}-{suffix}"
    shutil.move(tmp, final)
    print(f"published {final}")


if __name__ == "__main__":
    main()
