"""StableHLO model export (tools/export_model.py — TPU-native analog of
reference tools/pytorch2onnx.py)."""

import numpy as np
import jax
import jax.numpy as jnp


def test_export_roundtrip_tiny_detector():
    from jax import export as jexport
    from bonai_tpu.models import build_detector
    m = build_detector(
        dict(type="FasterRCNN",
             backbone=dict(type="ResNet", depth=18, base_channels=8),
             neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                       out_channels=16, num_outs=5),
             rpn_head=dict(anchor_generator=dict(
                 scales=[8], ratios=[0.5, 1.0, 2.0],
                 strides=[4, 8, 16, 32, 64]),
                 feat_channels=16, in_channels=16),
             roi_head=dict(
                 bbox_roi_extractor=dict(
                     roi_layer=dict(type="RoIAlign", output_size=7,
                                    sampling_ratio=0),
                     out_channels=16, featmap_strides=[4, 8, 16, 32]),
                 bbox_head=dict(type="Shared2FCBBoxHead", in_channels=16,
                                fc_out_channels=32, num_classes=1))),
        None,
        dict(rpn=dict(nms_pre=100, max_num=40, nms_thr=0.7),
             rcnn=dict(score_thr=0.05,
                       nms=dict(type="nms", iou_threshold=0.5),
                       max_per_img=10)))
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    def infer(params, batch_stats, img):
        shp = jnp.full((img.shape[0], 2), 64.0)
        sf = jnp.ones((img.shape[0],))
        return m.apply({"params": params, "batch_stats": batch_stats},
                       img, shp, sf, method="simple_test")

    sds = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), v)
    exp = jexport.export(jax.jit(infer))(
        sds["params"], sds.get("batch_stats", {}),
        jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32))
    blob = exp.serialize()
    assert len(blob) > 1000

    img = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3),
                      jnp.float32)
    direct = infer(v["params"], v.get("batch_stats", {}), img)
    reloaded = jexport.deserialize(blob)
    out = reloaded.call(v["params"], v.get("batch_stats", {}), img)
    np.testing.assert_allclose(np.asarray(out["det_bboxes"]),
                               np.asarray(direct["det_bboxes"]),
                               rtol=1e-5, atol=1e-5)
