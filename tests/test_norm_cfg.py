"""norm_cfg / conv_cfg / caffe-style plumbing tests (VERDICT r3 #3).

Covers the config families the reference expresses through
``norm_cfg``/``conv_cfg``/``style`` (reference
``mmdet/models/backbones/resnet.py:25,113-116``, ``configs/gn/``,
``configs/gn+ws/``, ``configs/scratch/``, ``configs/groie/``,
``configs/carafe/``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bonai_tpu.models import build_detector

from test_models_forward import demo_batch, tiny_test_cfg, tiny_train_cfg

GN = dict(type="GN", num_groups=4, requires_grad=True)
WS = dict(type="ConvWS")


def mask_rcnn_cfg(norm_cfg=None, conv_cfg=None, style="pytorch",
                  bbox_head_extra=None, mask_head_extra=None,
                  bbox_extractor=None, frozen_stages=1):
    bh = dict(num_classes=1, in_channels=32, fc_out_channels=64,
              bbox_coder=dict(target_means=[0.] * 4,
                              target_stds=[0.1, 0.1, 0.2, 0.2]))
    bh.update(bbox_head_extra or {})
    mh = dict(num_convs=2, in_channels=32, conv_out_channels=32,
              num_classes=1)
    mh.update(mask_head_extra or {})
    return dict(
        type="MaskRCNN",
        backbone=dict(type="ResNet", depth=50, num_stages=4,
                      out_indices=(0, 1, 2, 3), base_channels=16,
                      frozen_stages=frozen_stages, style=style,
                      norm_cfg=norm_cfg, conv_cfg=conv_cfg),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, num_outs=5, norm_cfg=norm_cfg,
                  conv_cfg=conv_cfg),
        rpn_head=dict(
            type="RPNHead", in_channels=32, feat_channels=32,
            anchor_generator=dict(scales=[8], ratios=[0.5, 1.0, 2.0],
                                  strides=[4, 8, 16, 32, 64])),
        roi_head=dict(
            type="StandardRoIHead",
            bbox_roi_extractor=bbox_extractor or dict(
                roi_layer=dict(output_size=7, sampling_ratio=2),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            bbox_head=bh,
            mask_roi_extractor=dict(
                roi_layer=dict(output_size=14, sampling_ratio=2),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            mask_head=mh),
    )


def run_forward_train(cfg):
    model = build_detector(cfg, tiny_train_cfg(), tiny_test_cfg())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
    batch = demo_batch(0)
    params = variables["params"]
    other = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        losses = model.apply({"params": p, **other}, batch,
                             method="forward_train",
                             rngs={"sampling": jax.random.PRNGKey(2)})
        return sum(jnp.sum(v) for v in losses.values()), losses

    (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    return variables, losses, grads


def test_gn_all_mask_rcnn():
    """GN-all (reference configs/gn/mask_rcnn_r50_fpn_gn-all_2x_coco.py):
    GN in backbone, neck, Shared4Conv1FC bbox head and mask head; no
    BN running statistics anywhere."""
    cfg = mask_rcnn_cfg(
        norm_cfg=GN, frozen_stages=-1,
        bbox_head_extra=dict(type="Shared4Conv1FCBBoxHead",
                             conv_out_channels=32, norm_cfg=GN),
        mask_head_extra=dict(norm_cfg=GN))
    variables, losses, grads = run_forward_train(cfg)
    # GN has no running stats: the batch_stats collection must be empty
    # for the whole model
    assert "batch_stats" not in variables or not any(
        jax.tree_util.tree_leaves(variables["batch_stats"]))
    # bbox head got its 4 shared convs
    bh = variables["params"]["bbox_head"]
    assert "shared_conv1" in bh and "shared_conv4" in bh
    assert "shared_fc1" in bh and "shared_fc2" not in bh
    # GN params receive gradients (scratch/gn trains them)
    g = grads["neck"]["lateral_0_norm"]["scale"]
    assert float(jnp.abs(g).sum()) > 0


def test_gn_ws_faster_rcnn():
    """gn+ws (reference configs/gn+ws/faster_rcnn_r50_fpn_gn_ws-all_1x):
    weight-standardised convs + GN through backbone/neck/bbox head."""
    cfg = mask_rcnn_cfg(
        norm_cfg=GN, conv_cfg=WS,
        bbox_head_extra=dict(type="Shared4Conv1FCBBoxHead",
                             conv_out_channels=32, norm_cfg=GN,
                             conv_cfg=WS))
    cfg["roi_head"]["mask_roi_extractor"] = None
    cfg["roi_head"]["mask_head"] = None
    cfg["type"] = "FasterRCNN"
    run_forward_train(cfg)


def test_caffe_style_strides_and_frozen_affine():
    """caffe style: stride moves to the 1x1 conv1 (reference
    resnet.py:113-116) — the downsample conv kernel shapes prove the
    placement; BN requires_grad=False freezes the affine params."""
    cfg = mask_rcnn_cfg(style="caffe",
                        norm_cfg=dict(type="BN", requires_grad=False))
    variables, losses, grads = run_forward_train(cfg)
    p = variables["params"]["backbone"]
    # caffe: layer2 first block conv1 is 1x1 and carries the stride; the
    # spatial geometry must still halve per stage — proven by the stage
    # output feeding FPN laterals with the same shapes as pytorch style
    # (init would fail otherwise).  kernel shape check: conv1 stays 1x1.
    assert p["layer2_0"]["conv1"]["kernel"].shape[:2] == (1, 1)
    # frozen affine: zero grads into BN scale/bias everywhere
    gb = grads["backbone"]
    for layer in ("layer4_0", "layer3_0"):
        for bn in ("bn1", "bn2", "bn3"):
            assert float(jnp.abs(gb[layer][bn]["scale"]).sum()) == 0.0
            assert float(jnp.abs(gb[layer][bn]["bias"]).sum()) == 0.0
    # conv weights still train
    assert float(jnp.abs(gb["layer4_0"]["conv1"]["kernel"]).sum()) > 0


def test_caffe_pytorch_same_geometry():
    """Both styles produce identical feature-map shapes."""
    from bonai_tpu.models.backbones.resnet import ResNet
    x = jnp.zeros((1, 64, 64, 3))
    for style in ("pytorch", "caffe"):
        m = ResNet(depth=50, base_channels=16, style=style)
        v = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(v, x)
        assert [o.shape for o in outs] == [
            (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 256),
            (1, 2, 2, 512)]


def test_groie_generic_extractor():
    """GRoIE (reference configs/groie/faster_rcnn_r50_fpn_groie_1x):
    GenericRoIExtractor with ConvModule pre and GeneralizedAttention
    post plugins on the bbox branch."""
    cfg = mask_rcnn_cfg(
        bbox_extractor=dict(
            type="GenericRoIExtractor", aggregation="sum",
            roi_layer=dict(output_size=7, sampling_ratio=2),
            out_channels=32, featmap_strides=[4, 8, 16, 32],
            pre_cfg=dict(type="ConvModule", in_channels=32,
                         out_channels=32, kernel_size=5, padding=2,
                         inplace=False),
            post_cfg=dict(type="GeneralizedAttention", in_channels=32,
                          spatial_range=-1, num_heads=4,
                          attention_type="0100", kv_stride=2)))
    variables, losses, grads = run_forward_train(cfg)
    p = variables["params"]
    assert "bbox_groie_pre" in p and "bbox_groie_post" in p
    # the plugins train
    assert float(jnp.abs(
        grads["bbox_groie_pre"]["conv"]["kernel"]).sum()) > 0


def test_carafe_mask_head_upsample():
    """CARAFE mask-head upsample (reference configs/carafe/
    mask_rcnn_r50_fpn_carafe_1x_coco.py ``upsample_cfg``)."""
    cfg = mask_rcnn_cfg(mask_head_extra=dict(upsample_cfg=dict(
        type="carafe", scale_factor=2, up_kernel=5, up_group=1,
        encoder_kernel=3, encoder_dilation=1, compressed_channels=16)))
    variables, _, grads = run_forward_train(cfg)
    up = variables["params"]["mask_head"]["upsample"]
    assert "channel_compressor" in up    # CARAFEPack, not deconv
