"""Synthetic overfit gate: the full CLI loop must be able to FIT data.

Round-3 VERDICT item 6: prior rounds proved finite losses and 30-step
decline; this proves the optimizer/assigner/eval composition actually
converges — train tools/train.py on 2 fixed synthetic clips with all
stochastic augs off (configs/videopose/pavenet_tiny_overfit.py), then
tools/test.py on the same clips must report ~perfect PoseTrack per-joint
AP (calibrated: Mean AP reaches 100.0 by step 600 at lr 2e-4; the
training loss is the production RLE objective so it goes far below zero
rather than to zero).
"""
import json
import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def synth_data(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("pt_overfit")
    video = root / "images" / "000001_bonn"
    video.mkdir(parents=True)
    rng = np.random.RandomState(0)
    H, W = 128, 160
    nframes = 4
    images, annotations = [], []
    aid = 1
    for i in range(1, nframes + 1):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(video / f"{i:08d}.jpg"), img)
        images.append(dict(
            id=i, file_name=f"images/000001_bonn/{i:08d}.jpg",
            width=W, height=H, nframes=nframes, frame_id=i,
            is_labeled=(i in (2, 3)), vid_id="000001"))
        if i in (2, 3):
            for t in range(2):  # two persons per labeled frame
                k = np.zeros((15, 3))
                k[:, 0] = rng.uniform(20, W - 20, 15)
                k[:, 1] = rng.uniform(20, H - 20, 15)
                k[:, 2] = 2
                annotations.append(dict(
                    id=aid, image_id=i, category_id=1,
                    keypoints=k.reshape(-1).tolist(),
                    bbox=[20 + 60 * t, 20, 60, 80],
                    bbox_head=[30 + 60 * t, 20, 20, 20],
                    area=4800, num_keypoints=15, iscrowd=0, track_id=t))
                aid += 1
    ann = dict(images=images, annotations=annotations,
               categories=[dict(id=1, name="person")])
    ann_file = root / "train.json"
    ann_file.write_text(json.dumps(ann))
    return str(ann_file), str(root)


def run_cli(args, timeout):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no tunneled-TPU plugin on CPU
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env, timeout=timeout,
        capture_output=True, text=True)


@pytest.mark.slow
def test_cli_overfit_to_perfect_ap(synth_data, tmp_path):
    ann_file, root = synth_data
    work = str(tmp_path / "work")
    cfg = "configs/videopose/pavenet_tiny_overfit.py"
    overrides = [
        "--cfg-options",
        f"data.train.ann_file={ann_file}",
        f"data.train.img_prefix={root}",
        f"data.test.ann_file={ann_file}",
        f"data.test.img_prefix={root}",
        "data.test.test_mode=true",
    ]
    # 600 steps on 2 clips; generous cap for loaded CI boxes
    r = run_cli(["tools/train.py", cfg, "--work-dir", work,
                 "--max-steps", "600", "--no-validate"] + overrides,
                timeout=3600)
    assert r.returncode == 0, r.stderr[-3000:]
    ckpts = sorted(d for d in os.listdir(work) if d.startswith("step_"))
    assert ckpts, os.listdir(work)

    r = run_cli(["tools/test.py", cfg, os.path.join(work, ckpts[-1])]
                + overrides, timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:]
    logs = r.stdout + r.stderr
    metrics = dict(re.findall(r"(posetrack/\w+|coco/\w+): ([-\d.]+)", logs))
    assert "posetrack/Mean" in metrics, logs[-2000:]
    mean_ap = float(metrics["posetrack/Mean"])
    ap50 = float(metrics.get("coco/AP50", 0))
    # calibrated head-room: exact memorization reaches 100.0 / 1.0
    assert mean_ap >= 90.0, (mean_ap, metrics)
    assert ap50 >= 0.85, (ap50, metrics)
