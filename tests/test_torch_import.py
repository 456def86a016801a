"""Torch checkpoint import: numerical parity of the weight mapping.

Builds small torch modules, exports their state_dict with
torchvision/mmdet key layouts, imports via the converters, and checks the
flax forward equals torch eval-mode forward (the foundation of the
bc_v100 checkpoint parity path — SURVEY.md §7 hard part #7).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from bonai_tpu.models.backbones.resnet import ResNet
from bonai_tpu.utils.torch_import import (torchvision_resnet_to_params,
                                          _conv_w, _fc_w, _fc_w_from_chw,
                                          _deconv_w)


def test_conv_weight_layout():
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 8, 8).astype(np.float32)
    w = rng.randn(4, 3, 3, 3).astype(np.float32)
    t = F.conv2d(torch.tensor(x), torch.tensor(w), padding=1).numpy()
    ours = jax.lax.conv_general_dilated(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(_conv_w(w)), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.transpose(np.asarray(ours), (0, 3, 1, 2)),
                               t, rtol=1e-4, atol=1e-5)


def test_deconv_weight_layout():
    import torch.nn.functional as F
    import flax.linen as nn
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 5, 5).astype(np.float32)
    w = rng.randn(4, 6, 2, 2).astype(np.float32)   # (in, out, kh, kw)
    t = F.conv_transpose2d(torch.tensor(x), torch.tensor(w),
                           stride=2).numpy()
    mod = nn.ConvTranspose(6, (2, 2), strides=(2, 2))
    params = {"params": {"kernel": jnp.asarray(_deconv_w(w)),
                         "bias": jnp.zeros(6)}}
    ours = mod.apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(ours), (0, 3, 1, 2)),
                               t, rtol=1e-4, atol=1e-5)


def test_fc_from_chw_layout():
    rng = np.random.RandomState(2)
    c, h, w = 3, 2, 2
    feat_chw = rng.randn(1, c, h, w).astype(np.float32)
    wt = rng.randn(5, c * h * w).astype(np.float32)
    torch_out = torch.tensor(feat_chw).flatten(1) @ torch.tensor(wt).T
    feat_hwc = np.transpose(feat_chw, (0, 2, 3, 1)).reshape(1, -1)
    ours = feat_hwc @ _fc_w_from_chw(wt, c, h, w)
    np.testing.assert_allclose(np.asarray(ours), torch_out.numpy(),
                               rtol=1e-4, atol=1e-5)


def _torch_stem_and_block():
    """torchvision-keyed stem + layer1.0 bottleneck in torch."""
    import torch.nn as tnn

    class Stem(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            # layer1.0 bottleneck
            self.l_conv1 = tnn.Conv2d(64, 64, 1, bias=False)
            self.l_bn1 = tnn.BatchNorm2d(64)
            self.l_conv2 = tnn.Conv2d(64, 64, 3, 1, 1, bias=False)
            self.l_bn2 = tnn.BatchNorm2d(64)
            self.l_conv3 = tnn.Conv2d(64, 256, 1, bias=False)
            self.l_bn3 = tnn.BatchNorm2d(64 * 4)
            self.l_ds = tnn.Conv2d(64, 256, 1, bias=False)
            self.l_dsbn = tnn.BatchNorm2d(256)

        def forward(self, x):
            x = self.relu(self.bn1(self.conv1(x)))
            x = self.maxpool(x)
            idt = self.l_dsbn(self.l_ds(x))
            y = self.relu(self.l_bn1(self.l_conv1(x)))
            y = self.relu(self.l_bn2(self.l_conv2(y)))
            y = self.l_bn3(self.l_conv3(y))
            return torch.relu(y + idt)

    m = Stem()
    # randomize BN stats so eval-mode normalisation is non-trivial
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.normal_(1, 0.2)
                mod.bias.normal_(0, 0.2)
    m.eval()
    sd = {
        "conv1.weight": m.conv1.weight,
        "bn1.weight": m.bn1.weight, "bn1.bias": m.bn1.bias,
        "bn1.running_mean": m.bn1.running_mean,
        "bn1.running_var": m.bn1.running_var,
    }
    for ours, theirs in (("conv1", "l_conv1"), ("conv2", "l_conv2"),
                         ("conv3", "l_conv3")):
        conv = getattr(m, theirs)
        bn = getattr(m, theirs.replace("conv", "bn"))
        sd[f"layer1.0.{ours}.weight"] = conv.weight
        b = ours.replace("conv", "bn")
        sd[f"layer1.0.{b}.weight"] = bn.weight
        sd[f"layer1.0.{b}.bias"] = bn.bias
        sd[f"layer1.0.{b}.running_mean"] = bn.running_mean
        sd[f"layer1.0.{b}.running_var"] = bn.running_var
    sd["layer1.0.downsample.0.weight"] = m.l_ds.weight
    sd["layer1.0.downsample.1.weight"] = m.l_dsbn.weight
    sd["layer1.0.downsample.1.bias"] = m.l_dsbn.bias
    sd["layer1.0.downsample.1.running_mean"] = m.l_dsbn.running_mean
    sd["layer1.0.downsample.1.running_var"] = m.l_dsbn.running_var
    sd = {k: v.detach() for k, v in sd.items()}
    return m, sd


def test_backbone_import_numerical_parity():
    """Imported stem+block output must equal torch eval-mode forward."""
    m, sd = _torch_stem_and_block()
    sd_np = {k: v.numpy() for k, v in sd.items()}

    # our backbone truncated to stage 1 via depth-50 layer1-only compare:
    model = ResNet(depth=50, num_stages=1, out_indices=(0,),
                   frozen_stages=-1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    params, batch_stats = torchvision_resnet_to_params(
        sd_np, {"backbone": variables["params"]},
        {"backbone": variables["batch_stats"]})
    # only layer1.0 imported; zero the un-imported blocks' effect by
    # comparing through block 0 only -> use num_stages=1 w/ 1 block:
    # simplest: run torch vs ours and compare after layer1.0 — our model
    # has 3 blocks in layer1, so compare against torch equivalent of all
    # 3 only if imported.  Instead compare stem output + first block by
    # rebuilding a 1-block variant:
    rng = np.random.RandomState(3)
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        t_out = m(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()

    import flax.linen as nn
    from bonai_tpu.models.backbones.resnet import (Bottleneck,
                                                   FrozenBatchNorm, conv)

    class StemBlock(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = conv(64, 7, 2, 3, "conv1")(x)
            x = FrozenBatchNorm(name="bn1")(x)
            x = nn.relu(x)
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                        constant_values=-jnp.inf)
            x = nn.max_pool(x, (3, 3), strides=(2, 2))
            return Bottleneck(planes=64, stride=1, downsample=True,
                              name="layer1_0")(x)

    sm = StemBlock()
    v2 = sm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p2, b2 = torchvision_resnet_to_params(
        sd_np, {"backbone": v2["params"]}, {"backbone": v2["batch_stats"]})
    out = sm.apply({"params": p2["backbone"],
                    "batch_stats": b2["backbone"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               t_out, rtol=1e-3, atol=1e-4)


def test_fuse_conv_bn_identity():
    """Folded BN must produce identical outputs with identical tree."""
    import sys
    import os.path as osp
    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
        osp.abspath(__file__))), "tools"))
    from fuse_conv_bn import fuse_tree
    from bonai_tpu.models.backbones.resnet import FrozenBatchNorm
    rng = np.random.RandomState(5)
    m = FrozenBatchNorm()
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    params = {"bn": dict(v["params"])}
    stats = {"bn": {"mean": jnp.asarray(rng.randn(8).astype(np.float32)),
                    "var": jnp.asarray(
                        rng.uniform(0.5, 2, 8).astype(np.float32))}}
    params["bn"]["scale"] = jnp.asarray(rng.randn(8).astype(np.float32))
    params["bn"]["bias"] = jnp.asarray(rng.randn(8).astype(np.float32))
    before = m.apply({"params": params["bn"],
                      "batch_stats": stats["bn"]}, x)
    fp, fs = fuse_tree(params, stats)
    after = m.apply({"params": fp["bn"], "batch_stats": fs["bn"]}, x)
    np.testing.assert_allclose(np.asarray(after), np.asarray(before),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fs["bn"]["mean"]), 0.0)
