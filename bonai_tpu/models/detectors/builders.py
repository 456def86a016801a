"""Shared backbone / neck module construction from reference-format cfgs.

Every detector family (two-stage and the 11 single-stage families) accepts
the same ``backbone=dict(type=...)`` / ``neck=dict(type=...)`` surface as
the reference (``mmdet/models/builder.py`` BACKBONES/NECKS registries), so
the variant axes — ResNeXt groups, caffe style, Res2Net scales, HRNet
widths, RegNet archs, DCN stages, GCB/attention plugins, norm_cfg/conv_cfg
— work identically in every family instead of only in TwoStageDetector.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..backbones.resnet import ResNet


class ChainedNeck(nn.Module):
    """Sequential neck chain, e.g. ``[FPN, BFP]`` (reference libra_rcnn
    configs; ``mmdet/models/detectors/single_stage.py:32`` builds a
    plain ``nn.Sequential`` for list necks)."""

    cfgs: Tuple[Any, ...]
    dtype: Any = jnp.float32

    def setup(self):
        mods = [build_neck_m(self.cfgs[0], self.dtype, name="neck0")]
        for j, ecfg in enumerate(self.cfgs[1:]):
            ecfg = dict(ecfg)
            etype = ecfg.pop("type", "BFP")
            assert etype == "BFP", f"unsupported chained neck {etype}"
            from ..necks.bfp import BFP
            mods.append(BFP(
                in_channels=ecfg.get("in_channels", 256),
                num_levels=ecfg.get("num_levels", 5),
                refine_level=ecfg.get("refine_level", 2),
                refine_type=ecfg.get("refine_type"),
                dtype=self.dtype, name=f"neck{j + 1}"))
        self.mods = tuple(mods)

    def __call__(self, feats):
        for m in self.mods:
            feats = m(feats)
        return feats


def build_backbone_m(cfg, dt, name="backbone"):
    """Construct the flax backbone module named ``name`` from a reference
    backbone cfg dict (callers bind it in setup())."""
    bk = dict(cfg)
    bk_type = bk.pop("type", "ResNet")
    if bk_type == "HRNet":
        from ..backbones.hrnet import HRNet
        return HRNet(
            extra=bk.get("extra"),
            frozen_stages=bk.get("frozen_stages", -1),
            norm_eval=bk.get("norm_eval", True),
            dtype=dt, name=name)
    if bk_type == "RegNet":
        from ..backbones.resnet import RegNet
        return RegNet(
            arch=bk.get("arch", "regnetx_3.2gf"),
            out_indices=tuple(bk.get("out_indices", (0, 1, 2, 3))),
            frozen_stages=bk.get("frozen_stages", -1),
            dtype=dt, name=name)
    if bk_type == "HourglassNet":
        from ..backbones.hourglass import HourglassNet
        return HourglassNet(
            downsample_times=bk.get("downsample_times", 5),
            num_stacks=bk.get("num_stacks", 2),
            stage_channels=tuple(bk.get("stage_channels",
                                        (256, 256, 384, 384, 384, 512))),
            stage_blocks=tuple(bk.get("stage_blocks",
                                      (2, 2, 2, 2, 2, 4))),
            feat_channel=bk.get("feat_channel", 256),
            dtype=dt, name=name)
    assert bk_type in ("ResNet", "ResNeXt", "Res2Net",
                       "DetectoRS_ResNet"), \
        f"unsupported backbone {bk_type}"
    res2 = bk_type == "Res2Net"
    return ResNet(
        depth=bk.get("depth", 50),
        num_stages=bk.get("num_stages", 4),
        base_channels=bk.get("base_channels", 64),
        out_indices=tuple(bk.get("out_indices", (0, 1, 2, 3))),
        frozen_stages=bk.get("frozen_stages", -1),
        norm_eval=bk.get("norm_eval", True),
        style=bk.get("style", "pytorch"),
        groups=bk.get("groups", 1),
        base_width=bk.get("base_width", 26 if res2 else 4),
        scales=bk.get("scales", 4 if res2 else 0),
        deep_stem=bk.get("deep_stem", res2),
        avg_down=bk.get("avg_down", res2),
        dcn=bk.get("dcn"),
        plugins=bk.get("plugins"),
        sac=bk.get("sac"),
        stage_with_sac=tuple(bk.get("stage_with_sac", (False,) * 4)),
        output_img=bk.get("output_img", False),
        stage_with_dcn=tuple(bk.get("stage_with_dcn", (False,) * 4)),
        norm_cfg=bk.get("norm_cfg"),
        conv_cfg=bk.get("conv_cfg"),
        dtype=dt, name=name)


def _extra_convs_mode(nk):
    """Normalise the reference's add_extra_convs / extra_convs_on_inputs
    combinations (mmdet fpn.py:18-76) to (add: bool, on: str)."""
    aec = nk.get("add_extra_convs", False)
    if isinstance(aec, str):
        return True, aec.replace("on_", "")
    if not aec:
        return False, "input"
    on_inputs = nk.get("extra_convs_on_inputs", True)
    return True, ("input" if on_inputs else "output")


def build_neck_m(cfg, dt, name="neck"):
    """Construct the flax neck module named ``name`` from a reference
    neck cfg dict.  A LIST cfg chains necks (reference libra configs:
    ``neck=[FPN, BFP]``) into one module applied sequentially."""
    if isinstance(cfg, (list, tuple)):
        return ChainedNeck(cfgs=tuple(dict(c) for c in cfg), dtype=dt,
                           name=name)
    nk = dict(cfg)
    nk_type = nk.pop("type", "FPN")
    if nk_type == "HRFPN":
        from ..necks.hrfpn import HRFPN
        return HRFPN(
            in_channels=tuple(nk.get("in_channels", (32, 64, 128, 256))),
            out_channels=nk.get("out_channels", 256),
            num_outs=nk.get("num_outs", 5),
            dtype=dt, name=name)
    if nk_type == "NASFPN":
        from ..necks.nas_fpn import NASFPN
        return NASFPN(
            in_channels=tuple(nk.get("in_channels", (512, 1024, 2048))),
            out_channels=nk.get("out_channels", 256),
            num_outs=nk.get("num_outs", 5),
            stack_times=nk.get("stack_times", 7),
            start_level=nk.get("start_level", 0),
            dtype=dt, name=name)
    if nk_type == "PAFPN":
        from ..necks.fpn import PAFPN
        return PAFPN(
            in_channels=tuple(nk.get("in_channels", (256, 512, 1024,
                                                     2048))),
            out_channels=nk.get("out_channels", 256),
            num_outs=nk.get("num_outs", 5),
            start_level=nk.get("start_level", 0),
            add_extra_convs=bool(nk.get("add_extra_convs", False)),
            dtype=dt, name=name)
    if nk_type == "FPN_CARAFE":
        from ..necks.fpn_carafe import FPN_CARAFE
        up = dict(nk.get("upsample_cfg") or {})
        return FPN_CARAFE(
            in_channels=tuple(nk.get("in_channels", (256, 512, 1024,
                                                     2048))),
            out_channels=nk.get("out_channels", 256),
            num_outs=nk.get("num_outs", 5),
            start_level=nk.get("start_level", 0),
            up_kernel=up.get("up_kernel", 5),
            encoder_kernel=up.get("encoder_kernel", 3),
            encoder_dilation=up.get("encoder_dilation", 1),
            dtype=dt, name=name)
    if nk_type == "RFP":
        from ..necks.rfp import RFP
        return RFP(
            in_channels=tuple(nk.get("in_channels", (256, 512, 1024,
                                                     2048))),
            out_channels=nk.get("out_channels", 256),
            num_outs=nk.get("num_outs", 5),
            rfp_steps=nk.get("rfp_steps", 2),
            rfp_backbone=nk.get("rfp_backbone"),
            aspp_out_channels=nk.get("aspp_out_channels", 64),
            aspp_dilations=tuple(nk.get("aspp_dilations", (1, 3, 6, 1))),
            dtype=dt, name=name)
    assert nk_type == "FPN", f"unsupported neck {nk_type}"
    from ..necks.fpn import FPN
    add_extra, extra_on = _extra_convs_mode(nk)
    return FPN(
        in_channels=tuple(nk.get("in_channels", (256, 512, 1024, 2048))),
        out_channels=nk.get("out_channels", 256),
        num_outs=nk.get("num_outs", 5),
        start_level=nk.get("start_level", 0),
        add_extra_convs=add_extra,
        extra_convs_on=extra_on,
        relu_before_extra_convs=bool(nk.get("relu_before_extra_convs",
                                            False)),
        no_norm_on_lateral=bool(nk.get("no_norm_on_lateral", False)),
        norm_cfg=nk.get("norm_cfg"),
        conv_cfg=nk.get("conv_cfg"),
        dtype=dt, name=name)
