"""Smoke test for demo/image_demo.py (reference surface:
``demo/image_demo.py`` — init_detector + inference_detector + skeleton
rendering to an output file)."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_image_demo_end_to_end(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from pavenet_tpu.config import Config
    from pavenet_tpu.models.builder import build_detector
    from pavenet_tpu.models.zoo import dummy_clip_batch
    from pavenet_tpu.apis.train import create_train_state
    from pavenet_tpu.utils.checkpoint import save_checkpoint

    cfg_path = os.path.join(REPO, "configs/videopose/pavenet_tiny_debug.py")
    model = build_detector(Config.fromfile(cfg_path).model)

    # random-weight orbax checkpoint (the demo's loading surface)
    rng = np.random.RandomState(0)
    # max_gt <= num_query (the config's loader-level max_gt is 10)
    dummy = dummy_clip_batch(rng, num_frames=model.num_frames,
                             height=256, width=448,
                             num_keypoints=model.num_keypoints,
                             max_gt=10, train=True)
    state, _ = create_train_state(model, dummy, seed=0)
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state, step=1)
    ckpt = os.path.join(ckpt_dir, os.listdir(ckpt_dir)[0])

    frames = []
    for t in range(3):
        f = str(tmp_path / f"frame{t}.jpg")
        cv2.imwrite(f, (rng.rand(96, 128, 3) * 255).astype(np.uint8))
        frames.append(f)
    out_file = str(tmp_path / "vis.jpg")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no tunneled-TPU plugin on CPU
    r = subprocess.run(
        [sys.executable, "demo/image_demo.py", *frames, cfg_path, ckpt,
         "--out-file", out_file, "--score-thr", "0.0"],
        cwd=REPO, env=env, timeout=1200, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(out_file)
    assert "poses ->" in r.stdout
    img = cv2.imread(out_file)
    assert img is not None and img.shape[2] == 3
