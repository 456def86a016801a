"""Async inference path (reference tests/async_benchmark.py /
test_async.py; VERDICT r3 #9)."""

import asyncio

import numpy as np
import pytest

from bonai_tpu import Config
from bonai_tpu.apis.inference import (async_inference_detector,
                                      init_detector)
from bonai_tpu.utils.async_utils import concurrent


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    import sys
    sys.path.insert(0, "tests")
    from helpers import make_bonai_dataset
    root = tmp_path_factory.mktemp("async_ds")
    make_bonai_dataset(str(root), num_images=2, size=64)
    cfg = Config.fromfile("configs/loft_foa/loft_foa_r50_fpn_2x_bonai.py")
    cfg.model["backbone"].update(depth=18, base_channels=16)
    cfg.model["neck"].update(in_channels=[16, 32, 64, 128],
                             out_channels=16)
    cfg.model["rpn_head"].update(in_channels=16, feat_channels=16)
    for k in ("bbox_roi_extractor", "mask_roi_extractor",
              "offset_roi_extractor"):
        cfg.model["roi_head"][k]["out_channels"] = 16
    cfg.model["roi_head"]["bbox_head"].update(in_channels=16,
                                              fc_out_channels=32)
    cfg.model["roi_head"]["mask_head"].update(num_convs=1, in_channels=16,
                                              conv_out_channels=16)
    cfg.model["roi_head"]["offset_head"].update(
        num_convs=1, in_channels=16, conv_out_channels=16,
        fc_out_channels=32)
    cfg.test_cfg["rpn"].update(nms_pre=64, nms_post=32, max_num=32)
    cfg.test_cfg["rcnn"].update(max_per_img=8)
    cfg.data.test["ann_file"] = str(root / "bonai_test.json")
    cfg.data.test["img_prefix"] = str(root / "images") + "/"
    for t in cfg.data.test["pipeline"]:
        if t["type"] == "MultiScaleFlipAug":
            t["img_scale"] = (64, 64)
    model, variables, _ = init_detector(cfg, compute_dtype="float32")
    return model, variables, cfg, root


def test_async_matches_sync(tiny_model):
    from bonai_tpu.apis.inference import inference_detector
    model, variables, cfg, root = tiny_model
    img = str(root / "images" / "img_0.png")
    sync = inference_detector(model, variables, cfg, img)

    async def run():
        limiter = asyncio.Semaphore(2)
        async with concurrent(limiter):
            return await async_inference_detector(model, variables, cfg,
                                                  img)
    res = asyncio.run(run())
    np.testing.assert_allclose(np.asarray(res[0][0]),
                               np.asarray(sync[0][0]), rtol=1e-5)


def test_async_concurrent_batch(tiny_model):
    model, variables, cfg, root = tiny_model
    imgs = [str(root / "images" / f"img_{i}.png") for i in range(2)]

    async def run():
        limiter = asyncio.Semaphore(2)

        async def one(p):
            async with concurrent(limiter):
                return await async_inference_detector(
                    model, variables, cfg, p)
        return await asyncio.gather(*[one(p) for p in imgs])
    results = asyncio.run(run())
    assert len(results) == 2
    for r in results:
        assert isinstance(r, tuple) and len(r) >= 2
