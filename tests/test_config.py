import os
import textwrap

import pytest

from bonai_tpu import Config
from bonai_tpu.registry import Registry, build_from_cfg


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(textwrap.dedent(content))
    return str(p)


def test_config_basic(tmp_path):
    f = _write(tmp_path, "a.py", """
        model = dict(type='LOFT', backbone=dict(depth=50))
        total_epochs = 24
        lr = 0.02 / 4
    """)
    cfg = Config.fromfile(f)
    assert cfg.model.type == "LOFT"
    assert cfg.model.backbone.depth == 50
    assert cfg.total_epochs == 24
    assert abs(cfg.lr - 0.005) < 1e-9


def test_config_base_inheritance(tmp_path):
    _write(tmp_path, "base_model.py", """
        model = dict(type='LOFT', backbone=dict(depth=50, frozen_stages=1))
    """)
    _write(tmp_path, "base_sched.py", """
        total_epochs = 24
        optimizer = dict(type='SGD', lr=0.005)
    """)
    f = _write(tmp_path, "child.py", """
        _base_ = ['./base_model.py', './base_sched.py']
        model = dict(backbone=dict(depth=101))
        total_epochs = 12
    """)
    cfg = Config.fromfile(f)
    assert cfg.model.type == "LOFT"            # inherited
    assert cfg.model.backbone.depth == 101     # overridden
    assert cfg.model.backbone.frozen_stages == 1   # merged sibling key kept
    assert cfg.total_epochs == 12
    assert cfg.optimizer.lr == 0.005


def test_config_delete_key(tmp_path):
    _write(tmp_path, "base.py", "opt = dict(type='SGD', momentum=0.9)")
    f = _write(tmp_path, "child.py", """
        _base_ = './base.py'
        opt = dict(_delete_=True, type='Adam')
    """)
    cfg = Config.fromfile(f)
    assert cfg.opt == dict(type="Adam")


def test_merge_from_dict(tmp_path):
    f = _write(tmp_path, "a.py", "model = dict(backbone=dict(depth=50))")
    cfg = Config.fromfile(f)
    cfg.merge_from_dict({"model.backbone.depth": 101, "work_dir": "/tmp/x"})
    assert cfg.model.backbone.depth == 101
    assert cfg.work_dir == "/tmp/x"


def test_config_dump_roundtrip(tmp_path):
    f = _write(tmp_path, "a.py", """
        model = dict(type='LOFT', scales=[8], ratios=[0.5, 1.0, 2.0])
    """)
    cfg = Config.fromfile(f)
    out = str(tmp_path / "dump.py")
    cfg.dump(out)
    cfg2 = Config.fromfile(out)
    assert dict(cfg2.model) == dict(cfg.model)


def test_registry_build():
    REG = Registry("thing")

    @REG.register_module()
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = build_from_cfg(dict(type="Foo", a=1), REG)
    assert obj.a == 1 and obj.b == 2
    obj = build_from_cfg(dict(type="Foo", a=1, b=9), REG, dict(b=3))
    assert obj.b == 9
    with pytest.raises(KeyError):
        build_from_cfg(dict(type="Bar"), REG)
    with pytest.raises(KeyError):
        @REG.register_module()
        class Foo:  # noqa: F811 — duplicate registration must fail
            pass


def test_reference_bonai_config_tree():
    """The shipped BONAI config composes from 4 base files — ours must too."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "configs", "loft_foa",
                        "loft_foa_r50_fpn_2x_bonai.py")
    if not os.path.exists(path):
        pytest.skip("config tree not created yet")
    cfg = Config.fromfile(path)
    assert cfg.model.type == "LOFT"
    assert cfg.model.roi_head.type == "LoftRoIHead"
    assert cfg.model.roi_head.offset_head.expand_feature_num == 4
    assert cfg.total_epochs == 24
