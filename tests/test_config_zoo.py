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


def test_posetrack21_configs():
    """PoseTrack21 (the north-star benchmark dataset): video flagship +
    single-frame PETR; PT21 ships PT18-format jsons (0-indexed)."""
    cfg = _cfg("videopose/pavenet_r50_frames3_posetrack21.py")
    built = build_detector(cfg.model)
    _assert_same_module(built, zoo.pavenet_r50_frames3())
    assert cfg.data.train.first_frame_index == 0
    assert "posetrack21" in cfg.data.train.ann_file

    cfg = _cfg("petr/petr_r50_posetrack21.py")
    built = build_detector(cfg.model)
    _assert_same_module(built, zoo.petr_r50_coco(num_keypoints=15))
    assert cfg.data.train.type == "opera.PosetrackPoseDataset"


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


def test_dkdetr_lvis_config():
    from pavenet_tpu.models.detectors.soit import SOITDetector
    cfg = _cfg("dk-detr/dkd_r50_70e_lvis.py")
    built = build_detector(cfg.model)
    assert isinstance(built, SOITDetector)
    assert built.num_classes == 1203
    assert built.cls_emb_dim == 512          # text-embedding cls branch
    assert built.temperature == 0.05
    assert built.norm_eval is False          # trainable (Sync)BN
    assert built.max_per_img == 300
    # the LVIS train pipeline wraps the dataset in repeat-factor sampling
    assert cfg.data.train.type == "opera.ClassBalancedDataset"
    assert cfg.data.train.oversample_thr == 1e-3
    assert cfg.data.train.dataset.type == "opera.LVISV1Dataset"


@pytest.mark.parametrize("name,ds_type", [
    ("dkd_r50_70e_test_coco.py", "opera.CocoDataset"),
    ("dkd_r50_70e_test_obj365.py", "opera.Objects365Dataset"),
    ("dkd_r50_70e_test_voc.py", "opera.VOCDataset"),
])
def test_dkdetr_transfer_configs(name, ds_type):
    cfg = _cfg(f"dk-detr/{name}")
    built = build_detector(cfg.model)
    assert built.cls_emb_dim == 512
    assert cfg.data.train is None
    assert cfg.data.test.type == ds_type


@pytest.mark.parametrize("tag,frames", [
    ("r50", 3), ("r50", 5), ("swin", 3), ("swin", 5), ("hrnet", 3)])
def test_stage2_pretrain_configs(tag, frames):
    """Stage-2 fake-clip COCO video pretraining (SURVEY Appendix C):
    video model at K=17 over CocoVideoPoseDataset clips."""
    cfg = _cfg(f"petr/pretrained/petr_{tag}_num_frame_{frames}"
               "_bs16_20e_coco_rle.py")
    built = build_detector(cfg.model)
    assert built.num_frames == frames
    assert built.num_keypoints == 17
    assert built.kpt_loss == "rle"
    assert built.backbone_type == {"r50": "resnet", "swin": "swin",
                                   "hrnet": "hrnet"}[tag]
    assert cfg.data.train.type == "opera.CocoVideoPoseDataset"
    assert cfg.data.train.num_frames == frames
    assert cfg.optimizer_config.cumulative_iters == 16
    assert cfg.lr_config.step == [15]


def test_every_shipped_config_builds():
    """Every config under configs/ (excl. _base_ fragments) must at least
    build its model through the config loader + builder."""
    import glob
    files = sorted(glob.glob(os.path.join(CFG, "**", "*.py"),
                             recursive=True))
    files = [f for f in files if os.sep + "_base_" + os.sep not in f]
    assert len(files) >= 21, files
    for f in files:
        cfg = Config.fromfile(f)
        assert "model" in cfg, f
        build_detector(cfg.model)


def test_resolve_act_dtype_policy():
    """CLI-facing compute-dtype policy: override > config act_dtype >
    float32 parity default (tools/{train,test,distill}.py --dtype)."""
    import jax.numpy as jnp

    from pavenet_tpu.models.builder import resolve_act_dtype

    assert resolve_act_dtype({}) is jnp.float32
    assert resolve_act_dtype(None) is jnp.float32
    assert resolve_act_dtype({"act_dtype": "bfloat16"}) is jnp.bfloat16
    assert resolve_act_dtype({"act_dtype": "bf16"}) is jnp.bfloat16
    # explicit override beats the config key either way
    assert resolve_act_dtype({"act_dtype": "bfloat16"}, "f32") is jnp.float32
    assert resolve_act_dtype({}, "bf16") is jnp.bfloat16
    # 'auto' means "follow the config"
    assert resolve_act_dtype({"act_dtype": "bf16"}, "auto") is jnp.bfloat16
    cfg = _cfg("videopose/pavenet_tiny_debug.py")
    assert resolve_act_dtype(cfg) is jnp.float32


def test_config_builds_bf16_model():
    """build_detector(dtype=bf16) must thread the compute dtype into the
    flax modules (params stay f32 — checkpoints restore unchanged)."""
    import jax.numpy as jnp

    cfg = _cfg("videopose/pavenet_tiny_debug.py")
    model = build_detector(cfg.model, dtype=jnp.bfloat16)
    assert model.dtype == jnp.bfloat16
