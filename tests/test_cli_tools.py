"""Smoke tests for the small CLI tools: offline re-evaluation
(``tools/eval_metric.py``) and the keypoint->pseudo-box dataset converter
(``tools/dataset_converters/keypoint2pseudo_box.py``)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=600):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    # CPU subprocesses must not register the machine's tunneled-TPU
    # plugin at all: its client init can block on a busy/unhealthy device
    # even when the computation runs on CPU
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env, timeout=timeout,
        capture_output=True, text=True)


def _synth_posetrack(root):
    rng = np.random.RandomState(0)
    H, W = 128, 160
    images, annotations = [], []
    kpts = {}
    aid = 1
    for i in (1, 2, 3):
        images.append(dict(
            id=i, file_name=f"images/v/{i:08d}.jpg", width=W, height=H,
            nframes=3, frame_id=i, is_labeled=i != 1, vid_id="000001"))
        if i == 1:
            continue
        k = np.zeros((15, 3))
        k[:, 0] = rng.uniform(20, W - 20, 15)
        k[:, 1] = rng.uniform(20, H - 20, 15)
        k[:, 2] = 2
        kpts[i] = k
        annotations.append(dict(
            id=aid, image_id=i, category_id=1,
            keypoints=k.reshape(-1).tolist(), bbox=[20, 20, 80, 80],
            bbox_head=[30, 20, 20, 20], area=6400, num_keypoints=15,
            iscrowd=0, track_id=0))
        aid += 1
    ann = dict(images=images, annotations=annotations,
               categories=[dict(id=1, name="person")])
    ann_file = os.path.join(root, "gt.json")
    with open(ann_file, "w") as f:
        json.dump(ann, f)
    return ann_file, kpts


def test_eval_metric_cli(tmp_path):
    """Perfect detections re-evaluated offline must score AP 100."""
    ann_file, kpts = _synth_posetrack(str(tmp_path))
    dets = []
    for img_id, k in kpts.items():
        dets.append(dict(
            image_id=img_id, category_id=1, score=0.99,
            keypoints=np.concatenate(
                [k[:, :2], np.ones((15, 1))], 1).reshape(-1).tolist()))
    dets_file = str(tmp_path / "dets.json")
    with open(dets_file, "w") as f:
        json.dump(dets, f)

    r = run_cli(["tools/eval_metric.py",
                 "configs/videopose/pavenet_tiny_debug.py", dets_file,
                 "--cfg-options", f"data.test.ann_file={ann_file}",
                 f"data.test.img_prefix={tmp_path}",
                 "data.test.test_mode=true"])
    assert r.returncode == 0, r.stderr[-3000:]
    out = r.stdout + r.stderr
    assert "posetrack/Mean: 100.0000" in out, out[-2000:]


def test_keypoint2pseudo_box_cli(tmp_path):
    ann_file, kpts = _synth_posetrack(str(tmp_path))
    out_file = str(tmp_path / "pseudo.json")
    r = run_cli(["tools/dataset_converters/keypoint2pseudo_box.py",
                 ann_file, out_file, "--margin", "0.1"])
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out_file) as f:
        data = json.load(f)
    for ann in data["annotations"]:
        k = np.asarray(ann["keypoints"], np.float32).reshape(-1, 3)
        x, y, w, h = ann["bbox"]
        kw = k[:, 0].max() - k[:, 0].min()
        kh = k[:, 1].max() - k[:, 1].min()
        # margin-expanded circumscribed rectangle
        assert w == pytest.approx(kw * 1.2, rel=1e-5)
        assert h == pytest.approx(kh * 1.2, rel=1e-5)
        assert x == pytest.approx(k[:, 0].min() - 0.1 * kw, rel=1e-4)
        assert y == pytest.approx(k[:, 1].min() - 0.1 * kh, rel=1e-4)
        assert ann["area"] == pytest.approx(w * h, rel=1e-5)


def test_get_flops_cli():
    """Complexity report (reference tools/train_fixed.py counterpart):
    params + XLA post-fusion FLOPs at a tiny bucket."""
    r = run_cli(["tools/get_flops.py",
                 "configs/videopose/pavenet_tiny_debug.py",
                 "--shape", "128", "192"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "params:" in r.stdout and "backbone" in r.stdout
    assert "forward FLOPs" in r.stdout, r.stdout


def test_torch2flax_cli(tmp_path):
    """Reference .pth -> orbax conversion round trip: the CLI must convert
    the reduced torch reference tree with zero unconverted keys and the
    restored params must match the source tensors."""
    import torch
    from test_parity_model import build_reference
    ref = build_reference()
    pth = str(tmp_path / "ref.pth")
    torch.save({"state_dict": ref.state_dict()}, pth)

    cfg_file = str(tmp_path / "tiny_oracle.py")
    base = os.path.join(REPO, "configs", "videopose",
                        "pavenet_tiny_debug.py")
    with open(cfg_file, "w") as f:
        f.write(f"""_base_ = [{base!r}]
model = dict(bbox_head=dict(
    num_query=20,
    transformer=dict(
        encoder=dict(num_layers=2,
                     transformerlayers=dict(
                         attn_cfgs=dict(embed_dims=64),
                         feedforward_channels=128)),
        decoder=dict(num_layers=2),
        refine_decoder=dict(num_layers=1))))
""")
    out = str(tmp_path / "flax_ckpt")
    r = run_cli(["tools/dataset_converters/torch2flax.py", cfg_file, pth,
                 out, "--strict"])
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])

    from pavenet_tpu.utils.checkpoint import restore_variables
    variables = restore_variables(out)
    lv = np.asarray(variables["params"]["head"]["level_embeds"])
    want = ref.state_dict()["bbox_head.transformer.level_embeds"].numpy()
    np.testing.assert_allclose(lv, want, atol=0)


def test_eval_metric_crowdpose_protocol(tmp_path):
    """The CrowdPose config must evaluate through the keypoints_crowd
    protocol: perfect detections -> keypoints_AP(E|M|H) keys at 1.0 /
    -1.0 (empty bands) from the CLI (reference crowd_pose.py:286-295)."""
    rng = np.random.RandomState(0)
    K = 14
    images, annotations = [], []
    kpts = {}
    for i, ci in enumerate((0.05, 0.5, 0.9), start=1):
        images.append(dict(id=i, file_name=f"{i}.jpg", width=640,
                           height=480, crowdIndex=ci))
        k = np.zeros((K, 3))
        k[:, 0] = rng.uniform(100, 540, K)
        k[:, 1] = rng.uniform(100, 380, K)
        k[:, 2] = 2
        kpts[i] = k
        annotations.append(dict(
            id=i, image_id=i, category_id=1,
            keypoints=k.reshape(-1).tolist(), bbox=[50, 50, 90, 120],
            area=90 * 120.0, num_keypoints=K, iscrowd=0))
    ann_file = str(tmp_path / "crowdpose_gt.json")
    with open(ann_file, "w") as f:
        json.dump(dict(images=images, annotations=annotations,
                       categories=[dict(id=1, name="person")]), f)
    dets = [dict(image_id=i, category_id=1, score=0.95,
                 keypoints=k.reshape(-1).tolist())
            for i, k in kpts.items()]
    dets_file = str(tmp_path / "dets.json")
    with open(dets_file, "w") as f:
        json.dump(dets, f)

    cfg = ("configs/petr/"
           "petr_swin-l-p4-w7-224-22kto1k_16x1_100e_crowdpose.py")
    r = run_cli(["tools/eval_metric.py", cfg, dets_file,
                 "--cfg-options", f"data.test.ann_file={ann_file}",
                 f"data.test.img_prefix={tmp_path}",
                 "data.test.test_mode=true"])
    assert r.returncode == 0, r.stderr[-3000:]
    out = r.stdout + r.stderr
    for key in ("keypoints_AP(E): 1.0000", "keypoints_AP(M): 1.0000",
                "keypoints_AP(H): 1.0000", "keypoints_AP: 1.0000"):
        assert key in out, out[-2000:]


def test_show_results_headless_falls_back(tmp_path, caplog):
    """--show in a headless environment must warn and not crash, still
    writing --show-dir renders (reference tools/test.py:62 --show)."""
    import importlib.util
    import logging
    import cv2

    spec = importlib.util.spec_from_file_location(
        "pavenet_test_cli", os.path.join(REPO, "tools", "test.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "a.jpg"),
                np.zeros((32, 48, 3), np.uint8))

    class FakeDS:
        img_prefix = str(tmp_path)
        data_infos = [dict(id=1, file_name="imgs/a.jpg")]

    dets = [dict(image_id=1, category_id=1, score=0.9,
                 keypoints=np.tile([10.0, 10.0, 0.9], 15).tolist())]
    show_dir = str(tmp_path / "out")
    logger = logging.getLogger("show_test")
    env_backup = os.environ.pop("DISPLAY", None)
    try:
        with caplog.at_level(logging.WARNING, logger="show_test"):
            mod.show_results(FakeDS(), dets, show_dir, 0.3, logger,
                             show=True)
    finally:
        if env_backup is not None:
            os.environ["DISPLAY"] = env_backup
    assert any("headless" in r.message for r in caplog.records)
    assert os.listdir(show_dir)
