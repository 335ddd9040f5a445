import os
import textwrap

from pavenet_tpu.config import Config, DictAction


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(textwrap.dedent(text))
    return str(p)


def test_base_inheritance_and_delete(tmp_path):
    _write(tmp_path, "base.py", """
        model = dict(type='A', backbone=dict(type='R50', depth=50), x=1)
        data = dict(samples_per_gpu=2)
    """)
    child = _write(tmp_path, "child.py", """
        _base_ = ['base.py']
        model = dict(backbone=dict(depth=101), y=2)
        data = dict(_delete_=True, samples_per_gpu=4)
    """)
    cfg = Config.fromfile(child)
    assert cfg.model.type == "A"
    assert cfg.model.backbone.depth == 101
    assert cfg.model.backbone.type == "R50"
    assert cfg.model.x == 1 and cfg.model.y == 2
    assert dict(cfg.data) == {"samples_per_gpu": 4}


def test_merge_from_dict_and_dictaction(tmp_path):
    f = _write(tmp_path, "c.py", "model = dict(lr=0.1, name='x')\n")
    cfg = Config.fromfile(f)
    cfg.merge_from_dict(DictAction.parse(["model.lr=0.5", "model.flag=true"]))
    assert cfg.model.lr == 0.5
    assert cfg.model.flag is True


def test_registry_scope_strings():
    from pavenet_tpu.registry import Registry
    reg = Registry("test")

    @reg.register_module()
    class Foo:
        def __init__(self, a=1):
            self.a = a

    assert reg.get("Foo") is Foo
    assert reg.get("opera.Foo") is Foo
    assert reg.get("mmdet.Foo") is Foo
    obj = reg.build(dict(type="mmcv.Foo", a=3))
    assert obj.a == 3
