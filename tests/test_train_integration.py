"""API-level train integration: train_detector over a 2-device mesh on a
synthetic dataset (exercises shard_map DP, prefetch, checkpointing)."""

import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from helpers import make_bonai_dataset, TRAIN_PIPELINE


def _tiny_cfg(tmp_path):
    from bonai_tpu import Config
    json_path, img_dir = make_bonai_dataset(str(tmp_path), num_images=4,
                                            size=96, buildings_per_img=3)
    pipeline = [dict(t) for t in TRAIN_PIPELINE]
    pipeline[2] = dict(type="Resize", img_scale=(96, 96), keep_ratio=True)
    cfg = Config(dict(
        model=dict(
            type="LOFT",
            backbone=dict(type="ResNet", depth=18, num_stages=4,
                          out_indices=(0, 1, 2, 3), frozen_stages=1),
            neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                      out_channels=32, num_outs=5),
            rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                          anchor_generator=dict(
                              scales=[8], ratios=[0.5, 1.0, 2.0],
                              strides=[4, 8, 16, 32, 64])),
            roi_head=dict(
                type="LoftRoIHead",
                bbox_roi_extractor=dict(
                    roi_layer=dict(output_size=7, sampling_ratio=2),
                    out_channels=32, featmap_strides=[4, 8, 16, 32]),
                bbox_head=dict(num_classes=1, in_channels=32,
                               fc_out_channels=32,
                               bbox_coder=dict(
                                   target_means=[0.] * 4,
                                   target_stds=[0.1, 0.1, 0.2, 0.2])),
                mask_roi_extractor=dict(
                    roi_layer=dict(output_size=14, sampling_ratio=2),
                    out_channels=32, featmap_strides=[4, 8, 16, 32]),
                mask_head=dict(num_convs=1, in_channels=32,
                               conv_out_channels=32, num_classes=1),
                offset_roi_extractor=dict(
                    roi_layer=dict(output_size=7, sampling_ratio=2),
                    out_channels=32, featmap_strides=[4, 8, 16, 32]),
                offset_head=dict(type="OffsetHeadExpandFeature",
                                 expand_feature_num=2,
                                 share_expand_fc=True, rotations=[0, 90],
                                 num_convs=1, num_fcs=1, in_channels=32,
                                 conv_out_channels=32, fc_out_channels=32,
                                 loss_offset=dict(type="SmoothL1Loss",
                                                  loss_weight=16.0)))),
        train_cfg=dict(
            rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                   min_pos_iou=0.3),
                     sampler=dict(num=32, pos_fraction=0.5)),
            rpn_proposal=dict(nms_pre=100, nms_post=64, max_num=64,
                              nms_thr=0.7),
            rcnn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                    min_pos_iou=0.5),
                      sampler=dict(num=32, pos_fraction=0.25),
                      mask_size=28)),
        test_cfg=dict(rpn=dict(nms_pre=100, nms_post=64, max_num=64,
                               nms_thr=0.7),
                      rcnn=dict(score_thr=0.05,
                                nms=dict(type="nms", iou_threshold=0.5),
                                max_per_img=8)),
        data=dict(samples_per_gpu=1, workers_per_gpu=1, max_gt=8,
                  inst_mask_size=32,
                  train=dict(type="BONAI", ann_file=json_path,
                             img_prefix=img_dir, bbox_type="building",
                             mask_type="roof", pipeline=pipeline)),
        optimizer=dict(type="SGD", lr=0.01, momentum=0.9,
                       weight_decay=1e-4),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(policy="step", warmup="linear", warmup_iters=5,
                       warmup_ratio=0.1, step=[8]),
        total_epochs=1,
        compute_dtype="float32",
        log_config=dict(interval=1),
        checkpoint_config=dict(interval=1),
    ))
    return cfg


def test_train_detector_api_two_devices(tmp_path):
    from bonai_tpu.apis import train_detector
    from bonai_tpu.engine import latest_checkpoint
    cfg = _tiny_cfg(tmp_path)
    wd = str(tmp_path / "wd")
    state, history = train_detector(cfg, wd, seed=0, max_steps=2,
                                    n_devices=2)
    assert int(state.step) == 2
    assert history, "no metrics logged"
    assert np.isfinite(history[-1]["loss"])
    assert "lr" in history[-1]
    ckpt = latest_checkpoint(wd)
    assert ckpt is not None
