"""ResNet backbone (flax.linen, NHWC, bf16-friendly).

reference: ``mmdet/models/backbones/resnet.py:304-664`` with the BONAI
config (``depth=50, frozen_stages=1, norm_eval=True, style='pytorch'``,
``configs/_base_/models/bonai_loft_foa_r50_fpn_basic.py:4-13``).

TPU-first notes:
- NHWC layout with explicit torch-style padding so torchvision weights can
  be imported bit-compatibly (SAME padding would differ on even sizes).
- ``norm_eval=True`` in the reference means BatchNorm always runs in eval
  mode during detection training; we therefore implement BN as a frozen
  affine transform over stored running statistics (``batch_stats``
  collection, never updated) — one fused multiply-add that XLA folds into
  the surrounding convs.
- ``frozen_stages`` is realised with ``stop_gradient`` at stage outputs
  (kills all gradients into the frozen prefix) plus an optimizer param
  mask exposed via :func:`frozen_param_filter`.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import numpy as np
import jax.numpy as jnp

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class FrozenBatchNorm(nn.Module):
    """BatchNorm evaluated with running statistics (reference
    ``norm_eval=True`` semantics).  scale/bias live in ``params`` (they are
    trainable outside frozen stages); mean/var live in ``batch_stats``.

    ``freeze_affine`` mirrors ``norm_cfg=dict(type='BN',
    requires_grad=False)`` in the reference caffe-style configs
    (e.g. ``configs/retinanet/retinanet_r50_caffe_fpn_1x_coco.py``): the
    affine params also get no gradient."""
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    freeze_affine: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.freeze_affine:
            scale = jax.lax.stop_gradient(scale)
            bias = jax.lax.stop_gradient(bias)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(c, jnp.float32)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(c, jnp.float32)).value
        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        w = inv.astype(self.dtype)
        b = (bias - mean * inv).astype(self.dtype)
        return x.astype(self.dtype) * w + b


def make_norm(norm_cfg, dtype, name):
    """Norm layer from an mmdet-style ``norm_cfg`` dict (reference
    ``mmcv.cnn.build_norm_layer`` as threaded through
    ``mmdet/models/backbones/resnet.py:25,32-33``).

    Supported: BN/SyncBN (frozen running stats — the detection-training
    semantics; ``requires_grad=False`` additionally freezes the affine) and
    GN.  No reference config family trains BN statistics (the scratch
    family uses GN throughout), so train-mode BN is intentionally absent.
    The flax param names (``scale``/``bias``) are identical for both, so
    checkpoint trees are layout-stable across norm choices.
    """
    cfg = dict(norm_cfg or {})
    t = cfg.get("type", "BN")
    if t == "GN":
        return nn.GroupNorm(num_groups=cfg.get("num_groups", 32),
                            epsilon=1e-5, dtype=dtype,
                            param_dtype=jnp.float32, name=name)
    assert t in ("BN", "SyncBN"), f"unsupported norm type {t}"
    return FrozenBatchNorm(dtype=dtype, name=name,
                           freeze_affine=not cfg.get("requires_grad", True))


def conv(features, kernel, stride=1, pad=None, name=None, dtype=jnp.float32,
         groups=1, conv_cfg=None):
    if pad is None:
        pad = kernel // 2
    ctype = (conv_cfg or {}).get("type", "Conv")
    if ctype == "ConvWS":
        # weight-standardised conv (gn+ws configs; reference
        # ``mmcv.cnn.ConvWS2d`` threaded via ``conv_cfg=dict(type='ConvWS')``)
        from ...ops.layers import ConvWS2d
        return ConvWS2d(features=features, kernel_size=kernel, stride=stride,
                        use_bias=False, groups=groups, dtype=dtype,
                        name=name)
    if ctype == "ConvAWS":
        # DetectoRS sets conv_cfg=ConvAWS backbone-wide; the adaptive
        # weight standardisation lives inside SAConv2d (ops/saconv.py)
        # which replaces conv2 in SAC stages — the remaining convs run
        # plain (documented deviation: AWS without SAC is a no-op at
        # inference and near-identity during fine-tuning)
        ctype = "Conv"
    assert ctype == "Conv", f"unsupported conv type {ctype}"
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)], use_bias=False,
                   dtype=dtype, name=name, feature_group_count=groups,
                   kernel_init=nn.initializers.variance_scaling(
                       2.0, "fan_out", "normal"))


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4
    groups: int = 1          # >1 with base_width: ResNeXt grouped bottleneck
    base_width: int = 4      # (reference: mmdet/models/backbones/resnext.py)
    dcn: Any = False         # conv2 -> deformable conv; the reference
                             # ``dcn=`` stage-plugin dict is passed
                             # through (type DCN/DCNv2, deform_groups)
    sac: bool = False        # conv2 -> switchable atrous conv (DetectoRS,
                             # reference detectors_resnet.py ``sac=``)
    rfp_in: bool = False     # accept an RFP feature (zero-init 1x1 add,
                             # reference detectors_resnet.py rfp_forward)
    plugins: Any = None      # ((type, kwargs, position), ...) — GCNet /
                             # empirical-attention blocks (reference
                             # resnet.py ``plugins=`` / forward_plugin)
    style: str = "pytorch"   # 'caffe': stride on the 1x1 conv1 (reference
                             # resnet.py:113-116)
    norm_cfg: Any = None     # mmdet norm_cfg dict (None -> frozen BN)
    conv_cfg: Any = None     # mmdet conv_cfg dict (None -> plain conv)

    def _plugin(self, out, position, idx_base):
        for i, (ptype, kwargs, pos) in enumerate(self.plugins or ()):
            if pos != position:
                continue
            name = f"{position}_plugin{i}"
            kw = dict(kwargs)
            if ptype == "ContextBlock":
                from ...ops.layers import ContextBlock
                out = ContextBlock(dtype=self.dtype, name=name, **kw)(out)
            elif ptype == "GeneralizedAttention":
                from ...ops.layers import GeneralizedAttention
                out = GeneralizedAttention(dtype=self.dtype, name=name,
                                           **kw)(out)
            elif ptype == "NonLocal2d":
                from ...ops.layers import NonLocal2d
                out = NonLocal2d(dtype=self.dtype, name=name, **kw)(out)
            else:
                raise KeyError(f"unknown plugin {ptype}")
        return out

    @nn.compact
    def __call__(self, x, rfp_feat=None):
        identity = x
        if self.groups == 1:
            width = self.planes
        else:
            width = int(self.planes * (self.base_width / 64)) * self.groups
        # style='pytorch': stride on the 3x3 conv2; style='caffe': stride on
        # the 1x1 conv1 (reference resnet.py:113-116)
        c1_stride = self.stride if self.style == "caffe" else 1
        c2_stride = 1 if self.style == "caffe" else self.stride
        out = conv(width, 1, c1_stride, 0, "conv1", self.dtype,
                   conv_cfg=self.conv_cfg)(x)
        out = make_norm(self.norm_cfg, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = self._plugin(out, "after_conv1", 0)
        if self.dcn:
            # flax stores dict fields as FrozenDict — duck-type, don't
            # isinstance(dict)
            dcfg = dict(self.dcn) if hasattr(self.dcn, "get") else {}
            dg = int(dcfg.get("deform_groups", 1))
            if dcfg.get("type", "DCNv2") == "DCN":
                # DCNv1 (reference dconv_c3-c5 configs)
                from ...ops.deform_conv import DeformConv2dPack
                out = DeformConv2dPack(
                    features=width, kernel_size=3, stride=c2_stride,
                    padding=1, use_bias=False, deform_groups=dg,
                    dtype=self.dtype, name="conv2")(out)
            else:
                from ...ops.deform_conv import ModulatedDeformConv2d
                out = ModulatedDeformConv2d(
                    features=width, kernel_size=3, stride=c2_stride,
                    padding=1, use_bias=False, deform_groups=dg,
                    dtype=self.dtype, name="conv2")(out)
        elif self.sac:
            from ...ops.saconv import SAConv2d
            out = SAConv2d(features=width, kernel_size=3,
                           stride=c2_stride, dtype=self.dtype,
                           name="conv2")(out)
        else:
            out = conv(width, 3, c2_stride, 1, "conv2", self.dtype,
                       groups=self.groups, conv_cfg=self.conv_cfg)(out)
        out = make_norm(self.norm_cfg, self.dtype, "bn2")(out)
        out = nn.relu(out)
        out = self._plugin(out, "after_conv2", 0)
        out = conv(self.planes * self.expansion, 1, 1, 0, "conv3",
                   self.dtype, conv_cfg=self.conv_cfg)(out)
        out = make_norm(self.norm_cfg, self.dtype, "bn3")(out)
        out = self._plugin(out, "after_conv3", 0)
        if self.downsample:
            identity = conv(self.planes * self.expansion, 1, self.stride, 0,
                            "ds_conv", self.dtype,
                            conv_cfg=self.conv_cfg)(x)
            identity = make_norm(self.norm_cfg, self.dtype,
                                 "ds_bn")(identity)
        out = out + identity
        if self.rfp_in and rfp_feat is not None:
            # zero-init 1x1 RFP injection (reference
            # detectors_resnet.py:50-57,105-107)
            out = out + nn.Conv(
                self.planes * self.expansion, (1, 1), dtype=self.dtype,
                kernel_init=nn.initializers.zeros,
                name="rfp_conv")(rfp_feat).astype(out.dtype)
        return nn.relu(out)


class Bottle2neck(nn.Module):
    """Res2Net block (reference ``mmdet/models/backbones/res2net.py:
    13-155``): the 3x3 stage becomes a hierarchy of ``scales-1`` small
    convs over channel splits with cumulative residual mixing."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4
    scales: int = 4
    base_width: int = 26
    base_channels: int = 64
    stage_type: str = "normal"     # 'stage' on each stage's first block
    avg_down: bool = True

    @nn.compact
    def __call__(self, x):
        identity = x
        width = int(np.floor(
            self.planes * (self.base_width / self.base_channels)))
        out = conv(width * self.scales, 1, 1, 0, "conv1", self.dtype)(x)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)

        spx = [out[..., i * width:(i + 1) * width]
               for i in range(self.scales)]
        sp = None
        outs = []
        for i in range(self.scales - 1):
            inp = spx[i] if (i == 0 or self.stage_type == "stage") \
                else sp + spx[i]
            sp = conv(width, 3, self.stride, 1, f"conv2_{i}",
                      self.dtype)(inp)
            sp = nn.relu(FrozenBatchNorm(dtype=self.dtype,
                                         name=f"bn2_{i}")(sp))
            outs.append(sp)
        last = spx[self.scales - 1]
        if self.stage_type == "stage" and self.stride != 1:
            # AvgPool2d(3, stride, padding=1) on the untouched split
            last = jnp.pad(last, ((0, 0), (1, 1), (1, 1), (0, 0)))
            last = nn.avg_pool(last, (3, 3), strides=(self.stride,) * 2)
        outs.append(last)
        out = jnp.concatenate(outs, axis=-1)

        out = conv(self.planes * self.expansion, 1, 1, 0, "conv3",
                   self.dtype)(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            if self.avg_down and self.stride != 1:
                identity = nn.avg_pool(identity, (self.stride,) * 2,
                                       strides=(self.stride,) * 2)
                identity = conv(self.planes * self.expansion, 1, 1, 0,
                                "ds_conv", self.dtype)(identity)
            else:
                identity = conv(self.planes * self.expansion, 1,
                                self.stride, 0, "ds_conv",
                                self.dtype)(identity)
            identity = FrozenBatchNorm(dtype=self.dtype,
                                       name="ds_bn")(identity)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 1
    norm_cfg: Any = None
    conv_cfg: Any = None

    @nn.compact
    def __call__(self, x):
        identity = x
        out = conv(self.planes, 3, self.stride, 1, "conv1", self.dtype,
                   conv_cfg=self.conv_cfg)(x)
        out = make_norm(self.norm_cfg, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, 1, 1, "conv2", self.dtype,
                   conv_cfg=self.conv_cfg)(out)
        out = make_norm(self.norm_cfg, self.dtype, "bn2")(out)
        if self.downsample:
            identity = conv(self.planes, 1, self.stride, 0, "ds_conv",
                            self.dtype, conv_cfg=self.conv_cfg)(x)
            identity = make_norm(self.norm_cfg, self.dtype,
                                 "ds_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """reference config surface: ``mmdet/models/backbones/resnet.py:525-648``.
    ``groups``/``base_width`` > defaults give ResNeXt
    (reference ``mmdet/models/backbones/resnext.py``)."""
    depth: int = 50
    num_stages: int = 4
    base_channels: int = 64   # reference ``base_channels`` (stem width)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = 1
    norm_eval: bool = True      # kept for config parity; BN is always frozen
    style: str = "pytorch"
    groups: int = 1
    base_width: int = 4
    scales: int = 0            # >1: Res2Net Bottle2neck stages
    deep_stem: bool = False    # 3x 3x3 stem (Res2Net / ResNet-v1d)
    avg_down: bool = False     # avgpool+1x1 downsample shortcuts
    dcn: Any = None            # truthy: DCNv2 conv2 in selected stages
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    sac: Any = None            # truthy: SAC conv2 (DetectoRS)
    stage_with_sac: Sequence[bool] = (False, False, False, False)
    output_img: bool = False   # prepend the input image (RFP consumes it)
    plugins: Any = None        # mmdet plugin specs: [{cfg, stages,
                               #  position}] (GCNet / empirical attention)
    norm_cfg: Any = None       # mmdet norm_cfg (None -> frozen BN;
                               # GN for the gn/gn+ws/scratch families)
    conv_cfg: Any = None       # mmdet conv_cfg (ConvWS for gn+ws)
    dtype: Any = jnp.float32

    def _stage_plugins(self, stage):
        """Resolve mmdet plugin specs for one stage into the static
        Bottleneck tuple format (reference ``make_stage_plugins``)."""
        out = []
        for spec in (self.plugins or ()):
            spec = dict(spec)
            stages = spec.get("stages")
            if stages is not None and not stages[stage]:
                continue
            cfg = dict(spec.get("cfg", {}))
            ptype = cfg.pop("type")
            out.append((ptype, tuple(sorted(cfg.items())),
                        spec.get("position", "after_conv3")))
        return tuple(out)

    @nn.compact
    def __call__(self, x, rfp_feats=None):
        img = x
        block_name, stage_blocks = ARCH_SETTINGS[self.depth]
        block_cls = Bottleneck if block_name == "bottleneck" else BasicBlock
        if self.scales > 1 and block_cls is Bottleneck:
            block_cls = Bottle2neck
        x = x.astype(self.dtype)
        if self.deep_stem:
            half = self.base_channels // 2
            for i, (ch, st) in enumerate([(half, 2), (half, 1),
                                          (self.base_channels, 1)]):
                x = conv(ch, 3, st, 1, f"stem_conv{i}", self.dtype,
                         conv_cfg=self.conv_cfg)(x)
                x = make_norm(self.norm_cfg, self.dtype, f"stem_bn{i}")(x)
                x = nn.relu(x)
        else:
            x = conv(self.base_channels, 7, 2, 3, "conv1", self.dtype,
                     conv_cfg=self.conv_cfg)(x)
            x = make_norm(self.norm_cfg, self.dtype, "bn1")(x)
            x = nn.relu(x)
        # torch MaxPool2d(3, 2, padding=1)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        planes = self.base_channels
        in_ch = self.base_channels
        expansion = 1 if block_cls is BasicBlock else 4
        for stage in range(self.num_stages):
            num_blocks = stage_blocks[stage]
            stride = 1 if stage == 0 else 2
            for b in range(num_blocks):
                # identity shortcut when shape is preserved (torch ResNet:
                # BasicBlock stage 1 has no downsample conv)
                ds = b == 0 and (stride != 1 or in_ch != planes * expansion)
                kwargs = dict(planes=planes,
                              stride=stride if b == 0 else 1,
                              downsample=ds,
                              dtype=self.dtype,
                              name=f"layer{stage + 1}_{b}")
                if block_cls in (Bottleneck, BasicBlock):
                    kwargs.update(norm_cfg=self.norm_cfg,
                                  conv_cfg=self.conv_cfg)
                if block_cls is Bottle2neck:
                    kwargs.update(scales=self.scales,
                                  base_width=self.base_width,
                                  base_channels=self.base_channels,
                                  stage_type="stage" if ds else "normal",
                                  avg_down=self.avg_down)
                elif block_cls is Bottleneck:
                    kwargs.update(
                        groups=self.groups, base_width=self.base_width,
                        style=self.style,
                        dcn=(self.dcn
                             if bool(self.dcn)
                             and bool(self.stage_with_dcn[stage])
                             else False),
                        sac=bool(self.sac)
                        and bool(self.stage_with_sac[stage]),
                        plugins=self._stage_plugins(stage))
                # RFP feature injected into each stage's first block
                # (reference detectors_resnet.py ResLayer: rfp_inplanes
                # only on block 0, stages > 0)
                rfp_here = (rfp_feats is not None and b == 0 and stage > 0
                            and block_cls is Bottleneck)
                if rfp_here:
                    kwargs.update(rfp_in=True)
                    x = block_cls(**kwargs)(x, rfp_feats[stage])
                else:
                    x = block_cls(**kwargs)(x)
            if self.frozen_stages >= stage + 1:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
            in_ch = planes * expansion
            planes *= 2
        if self.output_img:
            # DetectoRS: RFP needs the raw image to re-run its own
            # backbone copies (reference detectors_resnet.py:281-287)
            return tuple([img] + outs)
        return tuple(outs)


def frozen_param_filter(frozen_stages):
    """Return ``f(path_tuple) -> bool`` marking params frozen by config.

    Matches reference ``_freeze_stages`` (stem + layers 1..frozen_stages,
    ``resnet.py:604-621``): those params get no updates and no weight decay.
    """
    prefixes = []
    if frozen_stages >= 0:
        prefixes += ["conv1", "bn1"]
    for s in range(1, frozen_stages + 1):
        prefixes.append(f"layer{s}_")

    def is_frozen(path):
        names = [str(p) for p in path]
        if "backbone" not in " ".join(names):
            return False
        return any(any(n.startswith(pref) for n in names)
                   for pref in prefixes)
    return is_frozen


class RegNetBlock(nn.Module):
    """RegNetX bottleneck (reference ``mmdet/models/backbones/regnet.py``
    via ``Bottleneck`` with per-stage width/group, expansion 1)."""
    width: int
    bottleneck_width: int
    groups: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = conv(self.bottleneck_width, 1, 1, 0, "conv1", self.dtype)(x)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.bottleneck_width, 3, self.stride, 1, "conv2",
                   self.dtype, groups=self.groups)(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.width, 1, 1, 0, "conv3", self.dtype)(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = conv(self.width, 1, self.stride, 0, "ds_conv",
                            self.dtype)(x)
            identity = FrozenBatchNorm(dtype=self.dtype,
                                       name="ds_bn")(identity)
        return nn.relu(out + identity)


class RegNet(nn.Module):
    """RegNetX backbone (reference ``mmdet/models/backbones/regnet.py``;
    arXiv 2003.13678): per-block widths from the quantized linear rule
    ``w_j = w0 + wa*j`` snapped to powers of ``wm`` and ``divisor``,
    grouped into stages; 32-ch 3x3/2 stem (no maxpool)."""
    arch: Any = "regnetx_3.2gf"
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    stem_channels: int = 32
    dtype: Any = jnp.float32

    ARCH_SETTINGS = {
        "regnetx_400mf": dict(w0=24, wa=24.48, wm=2.54, group_w=16,
                              depth=22, bot_mul=1.0),
        "regnetx_800mf": dict(w0=56, wa=35.73, wm=2.28, group_w=16,
                              depth=16, bot_mul=1.0),
        "regnetx_1.6gf": dict(w0=80, wa=34.01, wm=2.25, group_w=24,
                              depth=18, bot_mul=1.0),
        "regnetx_3.2gf": dict(w0=88, wa=26.31, wm=2.25, group_w=48,
                              depth=25, bot_mul=1.0),
        "regnetx_4.0gf": dict(w0=96, wa=38.65, wm=2.43, group_w=40,
                              depth=23, bot_mul=1.0),
        "regnetx_6.4gf": dict(w0=184, wa=60.83, wm=2.07, group_w=56,
                              depth=17, bot_mul=1.0),
        "regnetx_8.0gf": dict(w0=80, wa=49.56, wm=2.88, group_w=120,
                              depth=23, bot_mul=1.0),
        "regnetx_12gf": dict(w0=168, wa=73.36, wm=2.37, group_w=112,
                             depth=19, bot_mul=1.0),
    }

    @staticmethod
    def stage_plan(cfg, divisor=8):
        """Per-stage (width, blocks, bottleneck width, groups) from the
        RegNet rule (reference ``generate_regnet`` /
        ``adjust_width_group`` / ``get_stages_from_blocks``)."""
        w_cont = np.arange(cfg["depth"]) * cfg["wa"] + cfg["w0"]
        ks = np.round(np.log(w_cont / cfg["w0"]) / np.log(cfg["wm"]))
        widths = cfg["w0"] * np.power(cfg["wm"], ks)
        widths = (np.round(widths / divisor) * divisor).astype(int)
        stage_w, stage_b = [], []
        for w in widths:
            if not stage_w or stage_w[-1] != w:
                stage_w.append(int(w))
                stage_b.append(1)
            else:
                stage_b[-1] += 1
        bw, groups = [], []
        for w in stage_w:
            wb = int(w * cfg["bot_mul"])
            g = min(cfg["group_w"], wb)
            wb = int(round(wb / g) * g)
            bw.append(wb)
            groups.append(wb // g)
        stage_w = [int(round(b / cfg["bot_mul"])) for b in bw]
        return stage_w, stage_b, bw, groups

    @nn.compact
    def __call__(self, x):
        cfg = dict(self.ARCH_SETTINGS[self.arch]) \
            if isinstance(self.arch, str) else dict(self.arch)
        stage_w, stage_b, bw, groups = self.stage_plan(cfg)
        x = x.astype(self.dtype)
        x = conv(self.stem_channels, 3, 2, 1, "conv1", self.dtype)(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        outs = []
        in_ch = self.stem_channels
        for stage in range(len(stage_w)):
            for b in range(stage_b[stage]):
                stride = 2 if b == 0 else 1
                ds = b == 0 and (stride != 1 or in_ch != stage_w[stage])
                x = RegNetBlock(width=stage_w[stage],
                                bottleneck_width=bw[stage],
                                groups=groups[stage],
                                stride=stride, downsample=ds,
                                dtype=self.dtype,
                                name=f"layer{stage + 1}_{b}")(x)
                in_ch = stage_w[stage]
            if self.frozen_stages >= stage + 1:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)


class ResLayerSharedHead(nn.Module):
    """C4 shared RoI head: one ResNet stage (res5) applied to RoI
    features (reference ``mmdet/models/roi_heads/shared_heads/
    res_layer.py`` + ``configs/_base_/models/mask_rcnn_r50_caffe_c4.py``
    ``shared_head=dict(type='ResLayer', stage=3, stride=2)``).
    (R, 14, 14, 1024) RoI features -> (R, 7, 7, 2048)."""

    depth: int = 50
    stage: int = 3
    stride: int = 2
    dilation: int = 1
    style: str = "caffe"
    norm_cfg: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        block_name, stage_blocks = ARCH_SETTINGS[self.depth]
        assert block_name == "bottleneck", \
            "ResLayer shared head needs a bottleneck depth (50/101/152)"
        planes = 64 * 2 ** self.stage
        in_ch = x.shape[-1]
        for b in range(stage_blocks[self.stage]):
            ds = b == 0 and (self.stride != 1 or in_ch != planes * 4)
            x = Bottleneck(planes=planes,
                           stride=self.stride if b == 0 else 1,
                           downsample=ds, style=self.style,
                           norm_cfg=self.norm_cfg, dtype=self.dtype,
                           name=f"layer{self.stage + 1}_{b}")(x)
        return x
