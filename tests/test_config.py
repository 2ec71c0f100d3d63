import os
import textwrap

from patchrefinerv2_tpu.config import Config


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(textwrap.dedent(content))
    return str(p)


def test_base_inheritance_and_merge(tmp_path):
    _write(
        tmp_path,
        "base.py",
        """
        min_depth = 1e-3
        model = dict(type='Foo', config=dict(a=1, b=dict(c=2)))
        train_cfg = dict(max_epochs=24)
        """,
    )
    leaf = _write(
        tmp_path,
        "leaf.py",
        """
        _base_ = ['./base.py']
        model = dict(config=dict(b=dict(d=3), e=4))
        train_cfg = dict(_delete_=True, max_epochs=48)
        """,
    )
    cfg = Config.fromfile(leaf)
    assert cfg.min_depth == 1e-3
    assert cfg.model.type == "Foo"
    assert cfg.model.config.a == 1
    assert cfg.model.config.b.c == 2
    assert cfg.model.config.b.d == 3
    assert cfg.model.config.e == 4
    assert cfg.train_cfg == {"max_epochs": 48}


def test_nested_base_chain(tmp_path):
    os.makedirs(tmp_path / "_base_", exist_ok=True)
    _write(tmp_path / "_base_", "run_time.py", "env_cfg = dict(x=1)\n")
    _write(
        tmp_path,
        "mid.py",
        """
        _base_ = ['./_base_/run_time.py']
        foo = [1, 2]
        """,
    )
    leaf = _write(tmp_path, "leaf.py", "_base_ = ['./mid.py']\nfoo = [3]\n")
    cfg = Config.fromfile(leaf)
    assert cfg.env_cfg.x == 1
    assert cfg.foo == [3]


def test_cfg_options_override(tmp_path):
    leaf = _write(tmp_path, "leaf.py", "model = dict(config=dict(max_depth=80))\n")
    cfg = Config.fromfile(leaf)
    cfg.merge_from_options(["model.config.max_depth=20", "new.key=[1,2]"])
    assert cfg.model.config.max_depth == 20
    assert cfg.new.key == [1, 2]
    cfg.merge_from_options({"model.config.min_depth": 1e-3})
    assert cfg.model.config.min_depth == 1e-3


def test_attribute_write_and_to_dict(tmp_path):
    leaf = _write(tmp_path, "leaf.py", "a = dict(b=1)\n")
    cfg = Config.fromfile(leaf)
    cfg.a.b = 7
    d = cfg.to_dict()
    assert d["a"]["b"] == 7 and type(d["a"]) is dict
