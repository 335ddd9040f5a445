"""Config-file zoo -> builder parity with the python zoo constructors.

The reference is config-driven (234 config files); the rebuild's config
files must produce exactly the same module hyperparameters as the zoo
constructors (VERDICT round-1 item 4).
"""
import os

import pytest

from pavenet_tpu.config import Config
from pavenet_tpu.models.builder import build_detector
from pavenet_tpu.models import zoo

CFG = os.path.join(os.path.dirname(__file__), "..", "configs")


def _cfg(path):
    return Config.fromfile(os.path.join(CFG, path))


def _assert_same_module(built, want):
    assert type(built) is type(want), (type(built), type(want))
    # flax modules are dataclasses: compare every declared hyperparameter
    for f in type(want).__dataclass_fields__:
        if f in ("parent", "name"):
            continue
        assert getattr(built, f) == getattr(want, f), (
            f, getattr(built, f), getattr(want, f))


def test_flagship_config_matches_zoo():
    cfg = _cfg("videopose/pavenet_r50_frames3_posetrack17.py")
    built = build_detector(cfg.model)
    _assert_same_module(built, zoo.pavenet_r50_frames3())


def test_petr_r50_config_matches_zoo():
    cfg = _cfg("petr/petr_r50_16x2_100e_coco.py")
    built = build_detector(cfg.model)
    _assert_same_module(built, zoo.petr_r50_coco())


def test_petr_swinl_config_matches_zoo():
    cfg = _cfg("petr/petr_swin-l-p4-w7-224-22kto1k_16x1_100e_coco.py")
    built = build_detector(cfg.model)
    _assert_same_module(built, zoo.petr_swinl_coco())


def test_petr_r101_config():
    cfg = _cfg("petr/petr_r101_16x2_100e_coco.py")
    built = build_detector(cfg.model)
    _assert_same_module(built, zoo.petr_r50_coco(backbone_depth=101))


def test_petr_crowdpose_config():
    cfg = _cfg("petr/petr_swin-l-p4-w7-224-22kto1k_16x1_100e_crowdpose.py")
    built = build_detector(cfg.model)
    _assert_same_module(built, zoo.petr_swinl_coco(num_keypoints=14))
    assert cfg.data.train.type == "opera.CrowdPoseDataset"


def test_frames5_config():
    cfg = _cfg("videopose/pavenet_r50_frames5_posetrack17.py")
    built = build_detector(cfg.model)
    _assert_same_module(built, zoo.pavenet_r50_frames3(num_frames=5))
    assert cfg.data.train.num_frames == 5


def test_posetrack18_configs():
    cfg = _cfg("videopose/pavenet_r50_frames3_posetrack18.py")
    built = build_detector(cfg.model)
    _assert_same_module(built, zoo.pavenet_r50_frames3())
    assert cfg.data.train.first_frame_index == 0

    cfg = _cfg("videopose/pavenet_swin_frames3_posetrack18.py")
    built = build_detector(cfg.model)
    _assert_same_module(
        built, zoo.pavenet_r50_frames3(backbone_type="swin"))


def test_soit_config_matches_zoo():
    cfg = _cfg("soit/soit_r50_16x2_50e_coco.py")
    built = build_detector(cfg.model)
    _assert_same_module(built, zoo.soit_r50_coco())


def test_inspose_config_builds():
    from pavenet_tpu.models.detectors.inspose import InsPoseDetector
    cfg = _cfg("inspose/inspose_r50_8x4_3x_coco.py")
    built = build_detector(cfg.model)
    assert isinstance(built, InsPoseDetector)
    assert built.num_keypoints == 17 and built.backbone_depth == 50
    assert built.max_per_img == 100


def test_unknown_backbone_raises():
    with pytest.raises(KeyError):
        build_detector(dict(type="opera.PETR",
                            backbone=dict(type="mmdet.RegNet")))


def test_petr_hrnet_config():
    cfg = _cfg("petr/petr_hrnetw48_16x2_100e_coco.py")
    built = build_detector(cfg.model)
    _assert_same_module(built, zoo.petr_r50_coco(
        backbone_type="hrnet", hrnet_width=48,
        backbone_out_indices=(1, 2, 3)))
