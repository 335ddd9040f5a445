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


def test_replace_cfg_vals_and_data_root(tmp_path, monkeypatch):
    """${key} interpolation (mmdet replace_cfg_vals) + MMDET_DATASETS
    data-root rewriting (mmdet update_data_root)."""
    from pavenet_tpu.config import Config, replace_cfg_vals, update_data_root
    f = tmp_path / "c.py"
    f.write_text(
        "num_keypoints = 15\n"
        "data_root = '/data/posetrack/'\n"
        "model = dict(head=dict(K='${num_keypoints}',\n"
        "             name='k${num_keypoints}_head'))\n"
        "data = dict(train=dict(ann_file=data_root + 'train.json'))\n")
    cfg = replace_cfg_vals(Config.fromfile(str(f)))
    assert cfg.model.head.K == 15            # verbatim value, not str
    assert cfg.model.head.name == "k15_head"  # str interpolation
    monkeypatch.setenv("MMDET_DATASETS", "/mnt/datasets/")
    update_data_root(cfg)
    assert cfg.data.train.ann_file == "/mnt/datasets/train.json"
    assert cfg.data_root == "/mnt/datasets/"
