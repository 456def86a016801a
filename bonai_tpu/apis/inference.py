"""Single-image inference API.

reference: ``mmdet/apis/inference.py:15-117`` (``init_detector`` /
``inference_detector``).
"""

from __future__ import annotations

import numpy as np


def init_detector(config, checkpoint=None, compute_dtype="bfloat16"):
    """Build a model + variables from config (+ optional checkpoint).

    ``config=None`` recovers the config from the provenance meta embedded
    in the checkpoint (reference checkpoints embed the full config text,
    ``tools/train.py:140-146``).  Returns (model, variables, cfg).
    """
    import jax
    import jax.numpy as jnp
    from .. import Config
    from ..models import build_detector

    if config is None:
        from ..engine.checkpoint import load_meta
        meta = load_meta(checkpoint) if checkpoint else None
        if not meta or "config" not in meta:
            raise ValueError(
                "config=None requires a checkpoint with embedded config "
                "meta (saved by train_detector)")
        config = Config.fromstring(meta["config"])
    if isinstance(config, str):
        config = Config.fromfile(config)
    model = build_detector(config.model, config.get("train_cfg"),
                           config.get("test_cfg"),
                           compute_dtype=compute_dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    if checkpoint:
        if str(checkpoint).endswith(".pth"):
            from ..utils import (import_torch_state_dict,
                                 mmdet_checkpoint_to_params)
            sd = import_torch_state_dict(checkpoint)
            params, batch_stats = mmdet_checkpoint_to_params(
                sd, variables["params"], variables.get("batch_stats", {}))
            variables = {"params": params, "batch_stats": batch_stats}
        else:
            from ..engine.checkpoint import load_params_only
            params, batch_stats = load_params_only(checkpoint)
            variables = {"params": params, "batch_stats": batch_stats}
    return model, variables, config


def inference_detector(model, variables, cfg, img):
    """Run the test pipeline + model on one image (path or BGR array).

    Returns the reference-style result tuple for the image.
    """
    import jax
    import jax.numpy as jnp
    from ..datasets.pipelines import build_pipeline
    from .test import results_to_host

    pipeline_cfg = [dict(t) for t in cfg.data.test["pipeline"]]
    if isinstance(img, str):
        results = {"img_info": {"filename": img}, "img_prefix": "",
                   "ann_info": {"bboxes": np.zeros((0, 4), np.float32),
                                "labels": np.zeros(0, np.int64),
                                "masks": [], "offsets": np.zeros((0, 2))}}
        pipe = build_pipeline(pipeline_cfg)
    else:
        results = {"img": img, "img_shape": img.shape[:2],
                   "ori_shape": img.shape[:2], "scale_factor": 1.0,
                   "ann_info": {"bboxes": np.zeros((0, 4), np.float32),
                                "labels": np.zeros(0, np.int64),
                                "masks": [], "offsets": np.zeros((0, 2))}}
        pipe = build_pipeline(
            [t for t in pipeline_cfg if t["type"] != "LoadImageFromFile"])
    out = pipe(results)
    image = np.ascontiguousarray(out["img"], np.float32)[None]
    h, w = out["img_shape"][:2]
    sf = float(np.asarray(out.get("scale_factor", 1.0)).reshape(-1)[0])
    dev = model.apply(variables, jnp.asarray(image),
                      jnp.asarray([[h, w]], jnp.float32),
                      jnp.asarray([sf]), method="simple_test")
    meta = out.get("img_metas", {"ori_shape": out.get("ori_shape")})
    return results_to_host(jax.device_get(dev), [meta])[0]


async def async_inference_detector(model, variables, cfg, img):
    """Asyncio wrapper over :func:`inference_detector` (reference
    ``mmdet/apis/inference.py:119`` ``async_inference_detector``).

    The reference releases the GIL around CUDA work via custom stream
    contextmanagers (``utils/contextmanagers.py:16-90``); on TPU the jax
    dispatch queue already overlaps host and device, so the async analog
    offloads the blocking pipeline+device call to the default executor —
    multiple coroutines overlap host preprocessing with device compute.
    Use :func:`bonai_tpu.utils.async_utils.concurrent` to bound in-flight
    requests.
    """
    import asyncio
    loop = asyncio.get_event_loop()
    return await loop.run_in_executor(
        None, inference_detector, model, variables, cfg, img)
