"""Backbone/neck structure tests (eval_shape only — no heavy compute;
the analog of reference tests/test_models/test_backbones.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from bonai_tpu.models.backbones.resnet import ResNet
from bonai_tpu.models.necks.fpn import FPN


def _shapes(tree):
    return jax.tree_util.tree_map(lambda x: x.shape, tree)


def test_resnet50_structure():
    m = ResNet(depth=50, frozen_stages=1)
    out, v = jax.eval_shape(
        lambda r, x: m.init_with_output(r, x),
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    c2, c3, c4, c5 = out
    assert c2.shape == (1, 56, 56, 256)
    assert c3.shape == (1, 28, 28, 512)
    assert c4.shape == (1, 14, 14, 1024)
    assert c5.shape == (1, 7, 7, 2048)
    p = v["params"]
    assert p["conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert "layer4_2" in p
    # batch stats present for every BN
    assert v["batch_stats"]["bn1"]["mean"].shape == (64,)


def test_resnet18_basic_blocks():
    m = ResNet(depth=18, frozen_stages=-1)
    out, v = jax.eval_shape(
        lambda r, x: m.init_with_output(r, x),
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert out[-1].shape == (1, 2, 2, 512)
    assert "conv3" not in v["params"]["layer1_0"]   # basic block has 2 convs


def test_resnext_grouped_conv():
    m = ResNet(depth=50, groups=32, base_width=4)
    v = jax.eval_shape(m.init, jax.random.PRNGKey(0),
                       jnp.zeros((1, 64, 64, 3)))
    k = v["params"]["layer1_0"]["conv2"]["kernel"]
    # width = 64*(4/64)*32 = 128; grouped: in/groups = 4
    assert k.shape == (3, 3, 4, 128)


def test_fpn_output_levels():
    m = FPN(in_channels=(256, 512, 1024, 2048), out_channels=256, num_outs=5)
    ins = tuple(jnp.zeros((1, s, s, c)) for s, c in
                [(64, 256), (32, 512), (16, 1024), (8, 2048)])
    outs, _ = jax.eval_shape(
        lambda r, x: m.init_with_output(r, x), jax.random.PRNGKey(0), ins)
    assert len(outs) == 5
    assert [o.shape[1] for o in outs] == [64, 32, 16, 8, 4]
    assert all(o.shape[-1] == 256 for o in outs)


def test_fpn_values_topdown():
    """Lateral + 2x nearest upsample adds coarse into fine (numeric)."""
    m = FPN(in_channels=(4, 8), out_channels=4, num_outs=2)
    ins = (jnp.ones((1, 8, 8, 4)), jnp.ones((1, 4, 4, 8)))
    outs, _ = m.init_with_output(jax.random.PRNGKey(0), ins)
    assert outs[0].shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(outs[0])).all()


def test_hrnet_w32_structure():
    from bonai_tpu.models.backbones.hrnet import HRNet
    m = HRNet(frozen_stages=1)
    outs, v = jax.eval_shape(
        lambda r, x: m.init_with_output(r, x),
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    assert len(outs) == 4
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4]
    assert [o.shape[-1] for o in outs] == [32, 64, 128, 256]


def test_hrfpn_levels():
    from bonai_tpu.models.necks.hrfpn import HRFPN
    m = HRFPN(num_outs=5)
    ins = tuple(jnp.zeros((1, 32 // (2 ** i), 32 // (2 ** i), c))
                for i, c in enumerate((32, 64, 128, 256)))
    outs, _ = jax.eval_shape(
        lambda r, x: m.init_with_output(r, x), jax.random.PRNGKey(0), ins)
    assert len(outs) == 5
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4, 2]
    assert all(o.shape[-1] == 256 for o in outs)


def test_res2net_structure_and_forward():
    """Res2Net-50 (reference mmdet/models/backbones/res2net.py): deep
    stem, Bottle2neck channel-split hierarchy, avg-down shortcuts."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bonai_tpu.models.backbones.resnet import ResNet
    m = ResNet(depth=50, base_channels=64, scales=4, base_width=26,
               deep_stem=True, avg_down=True, frozen_stages=-1)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    outs = m.apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert [o.shape for o in outs] == [(1, 16, 16, 256), (1, 8, 8, 512),
                                       (1, 4, 4, 1024), (1, 2, 2, 2048)]
    p = variables["params"]
    assert "stem_conv0" in p and "conv1" not in p      # deep stem
    blk = p["layer1_0"]
    # Bottle2neck: scales-1 = 3 hierarchical 3x3 convs of width
    # floor(64 * 26/64) = 26
    for i in range(3):
        assert blk[f"conv2_{i}"]["kernel"].shape == (3, 3, 26, 26)
    assert blk["conv1"]["kernel"].shape[-1] == 26 * 4
    assert "ds_conv" in blk                            # avg-down shortcut
    out2 = m.apply(variables, jnp.asarray(
        np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32))
    assert all(np.isfinite(np.asarray(o)).all() for o in out2)


def test_regnet_widths_and_forward():
    """RegNetX-3.2GF stage plan matches the published architecture
    (widths [96, 192, 432, 1008], blocks [2, 6, 15, 2]); forward
    produces a 4-level stride-4..32 pyramid."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bonai_tpu.models.backbones.resnet import RegNet
    cfg = RegNet.ARCH_SETTINGS["regnetx_3.2gf"]
    sw, sb, bw, groups = RegNet.stage_plan(cfg)
    assert sw == [96, 192, 432, 1008]
    assert sb == [2, 6, 15, 2]
    assert all(b % g == 0 for b, g in zip(bw, groups))
    m = RegNet(arch="regnetx_400mf")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    outs = m.apply(v, jnp.asarray(
        np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32))
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_pafpn_structure():
    """PAFPN (reference mmdet/models/necks/pafpn.py): bottom-up path
    aggregation on top of FPN; shapes and param groups check."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bonai_tpu.models.necks.fpn import PAFPN
    m = PAFPN(in_channels=(8, 16, 32, 64), out_channels=8, num_outs=5)
    ins = [jnp.asarray(np.random.RandomState(i).randn(1, 32 >> i, 32 >> i,
                                                      c), jnp.float32)
           for i, c in enumerate((8, 16, 32, 64))]
    v = m.init(jax.random.PRNGKey(0), ins)
    outs = m.apply(v, ins)
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4, 2]
    p = v["params"]
    for i in range(3):
        assert f"downsample_{i}" in p and f"pafpn_{i}" in p
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_resnet_stage_plugins_gcb():
    """GCNet ContextBlock plugin after conv3 of stages 2-4 (reference
    resnet.py ``plugins=`` / configs/gcnet)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bonai_tpu.models.backbones.resnet import ResNet
    m = ResNet(depth=50, base_channels=8, frozen_stages=-1,
               plugins=[dict(cfg=dict(type="ContextBlock", ratio=0.25),
                             stages=(False, True, True, True),
                             position="after_conv3")])
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    # stage 1 has no plugin; stages 2-4 do
    assert "after_conv3_plugin0" not in v["params"]["layer1_0"]
    assert "after_conv3_plugin0" in v["params"]["layer2_0"]
    outs = m.apply(v, x)
    assert len(outs) == 4 and outs[0].shape[-1] == 32
    # zero-init fusion conv -> block starts as identity: outputs finite
    assert all(bool(jnp.isfinite(o).all()) for o in outs)
