"""8-device data-parallel train-step test (the pytest analog of the
driver's ``dryrun_multichip(8)``).

Runs a real LOFT train step (assign/sample -> bbox/mask/FOA losses ->
pmean'd grads -> SGD update) shard_map'd over all 8 virtual CPU devices
from conftest.  The model is cut to 2 backbone stages / 3 FPN levels so
compile stays fast on a single-core host; the collective structure
(grad pmean over the full 8-way mesh) is identical to production.

Reference semantics: DDP grad averaging, ``mmdet/apis/train.py:75-79``,
``mmdet/core/utils/dist_utils.py:10-51``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _mini_loft():
    from bonai_tpu import Config
    from bonai_tpu.models import build_detector
    cfg = Config(dict(
        model=dict(
            type="LOFT",
            backbone=dict(type="ResNet", depth=18, num_stages=2,
                          base_channels=8, out_indices=(0, 1),
                          frozen_stages=1),
            neck=dict(type="FPN", in_channels=[8, 16], out_channels=16,
                      num_outs=2),
            rpn_head=dict(type="RPNHead", in_channels=16, feat_channels=16,
                          anchor_generator=dict(
                              scales=[8], ratios=[0.5, 1.0, 2.0],
                              strides=[4, 8])),
            roi_head=dict(
                type="LoftRoIHead",
                bbox_roi_extractor=dict(
                    roi_layer=dict(output_size=7, sampling_ratio=2),
                    out_channels=16, featmap_strides=[4, 8]),
                bbox_head=dict(num_classes=1, in_channels=16,
                               fc_out_channels=16,
                               bbox_coder=dict(
                                   target_means=[0.] * 4,
                                   target_stds=[0.1, 0.1, 0.2, 0.2])),
                mask_roi_extractor=dict(
                    roi_layer=dict(output_size=14, sampling_ratio=2),
                    out_channels=16, featmap_strides=[4, 8]),
                mask_head=dict(num_convs=1, in_channels=16,
                               conv_out_channels=16, num_classes=1),
                offset_roi_extractor=dict(
                    roi_layer=dict(output_size=7, sampling_ratio=2),
                    out_channels=16, featmap_strides=[4, 8]),
                offset_head=dict(type="OffsetHeadExpandFeature",
                                 expand_feature_num=2,
                                 share_expand_fc=True, rotations=[0, 90],
                                 num_convs=1, num_fcs=1, in_channels=16,
                                 conv_out_channels=16, fc_out_channels=16,
                                 loss_offset=dict(type="SmoothL1Loss",
                                                  loss_weight=16.0)))),
        train_cfg=dict(
            rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                   min_pos_iou=0.3),
                     sampler=dict(num=16, pos_fraction=0.5)),
            rpn_proposal=dict(nms_pre=16, nms_post=16, max_num=16,
                              nms_thr=0.7),
            rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                    min_pos_iou=0.5),
                      sampler=dict(num=16, pos_fraction=0.25),
                      mask_size=28)),
        test_cfg=dict(rpn=dict(nms_pre=32, nms_post=16, max_num=16,
                               nms_thr=0.7),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(type="nms", iou_threshold=0.5),
                                max_per_img=8)),
    ))
    model = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg,
                           compute_dtype="float32")
    return model


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_eight_device_train_step():
    from bonai_tpu.engine import (build_optimizer, build_lr_schedule,
                                  create_train_state, make_train_step)
    from bonai_tpu.engine.optim import frozen_mask_from_model
    from bonai_tpu.engine.train_step import make_mesh

    model = _mini_loft()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    params = variables["params"]
    schedule = build_lr_schedule(0.01, 10, [8], 1)
    frozen = frozen_mask_from_model(params, 1)
    tx = build_optimizer(dict(type="SGD", lr=0.01, momentum=0.9,
                              weight_decay=1e-4), schedule,
                         dict(max_norm=35), frozen)
    state = create_train_state(params, variables.get("batch_stats", {}), tx)

    mesh = make_mesh(8)
    step = make_train_step(model, tx, mesh=mesh)

    b, size, g, m = 8, 32, 2, 28
    r = np.random.RandomState(0)
    xy1 = r.uniform(0, size * 0.4, (b, g, 2)).astype(np.float32)
    wh = r.uniform(6, size * 0.4, (b, g, 2)).astype(np.float32)
    batch = {
        "image": jnp.asarray(r.randn(b, size, size, 3), jnp.float32),
        "img_shape": jnp.full((b, 2), float(size)),
        "gt_bboxes": jnp.asarray(
            np.concatenate([xy1, np.minimum(xy1 + wh, size - 1)], -1)),
        "gt_labels": jnp.zeros((b, g), jnp.int32),
        "gt_valid": jnp.ones((b, g), bool),
        "gt_masks": jnp.asarray((r.rand(b, g, m, m) > 0.4).astype(np.uint8)),
        "gt_offsets": jnp.asarray(r.uniform(-4, 4, (b, g, 2)), jnp.float32),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    assert int(state.step) == 1
    # grads were pmean'd: params stay replica-identical by construction;
    # a second step must also run (exercises donated-buffer path)
    state, metrics2 = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics2["loss"]))
    assert int(state.step) == 2


def test_entry_program_has_no_weight_constants():
    """Driver-gate regression: entry() must pass the model variables as
    an ARGUMENT.  Closing over them bakes ~650 MB of weights into the
    serialized program as constants, which the tunneled remote compiler
    rejects (HTTP 413) — the single-chip compile gate then can never
    pass."""
    import jax
    import __graft_entry__ as ge
    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    size = len(lowered.compiler_ir(
        dialect="stablehlo").operation.get_asm(binary=True))
    assert size < 50_000_000, f"entry() program is {size/1e6:.0f} MB"
