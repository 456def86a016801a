"""v1 -> v2 checkpoint upgrade (reference tools/upgrade_model_version.py
semantics: bg slot 0 -> last for cls, bg reg/mask channels dropped)."""

import sys
import os.path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(
    __file__))), "tools"))
from upgrade_model_version import (bg_first_to_last, drop_bg_reg,
                                   upgrade_state_dict)


def test_cls_reorder_and_reg_truncate():
    nc = 3                                  # 2 fg + bg (v1 counts bg)
    fc_cls_w = np.arange(3 * 4, dtype=np.float32).reshape(3, 4)
    out = bg_first_to_last(fc_cls_w, nc)
    # rows become [fg1, fg2, bg]
    np.testing.assert_array_equal(out[2], fc_cls_w[0])
    np.testing.assert_array_equal(out[0], fc_cls_w[1])

    fc_reg_w = np.arange(3 * 4 * 5, dtype=np.float32).reshape(12, 5)
    out = drop_bg_reg(fc_reg_w, nc)
    assert out.shape == (8, 5)
    np.testing.assert_array_equal(out[0], fc_reg_w[4])  # fg1's dx row

    sd = {"bbox_head.fc_cls.weight": fc_cls_w,
          "bbox_head.fc_cls.bias": np.arange(3, dtype=np.float32),
          "bbox_head.fc_reg.weight": fc_reg_w,
          "backbone.conv1.weight": np.ones((4, 3, 7, 7), np.float32)}
    new = upgrade_state_dict(sd, num_classes=nc, two_stage=True)
    # two-stage heads gain the roi_head prefix (v2 naming)
    assert "roi_head.bbox_head.fc_cls.weight" in new
    assert "backbone.conv1.weight" in new
    b = new["roi_head.bbox_head.fc_cls.bias"]
    np.testing.assert_array_equal(b, [1.0, 2.0, 0.0])
