"""Synthetic multi-person scene generator (datasets/synthetic.py).

The generator backs the windowed-encoder accuracy work (teacher
training + distillation + held-out AP agreement, see tools/distill.py):
these tests pin the contract it must keep — PoseTrack-format output the
existing dataset/pipeline/eval stack consumes unchanged, deterministic
annotations, and a GT-as-detections oracle scoring ~perfect AP (if that
breaks, any AP measured on this data is meaningless).
"""
import json

import numpy as np

from pavenet_tpu.datasets.synthetic import generate_posetrack_dataset


def test_generate_loads_and_oracle_ap(tmp_path):
    root = str(tmp_path / "synth")
    ann = generate_posetrack_dataset(
        root, num_videos=3, frames_per_video=4, height=128, width=192,
        max_persons=3, seed=7)

    from pavenet_tpu.datasets.posetrack import PosetrackVideoPoseDataset
    ds = PosetrackVideoPoseDataset(ann, img_prefix=root, num_frames=3,
                                   test_mode=True)
    assert len(ds) == 12  # every frame labeled -> every frame a clip
    sample = ds[0]
    assert len(sample["frame_files"]) == 3
    assert sample["gt_keypoints"].shape[1:] == (15, 3)
    assert sample["gt_keypoints"].shape[0] >= 1

    # GT-as-detections oracle: the written annotations round-trip the
    # eval stack at ~perfect AP
    from pavenet_tpu.apis.test import evaluate_dataset
    dets = []
    with open(ann) as fh:
        payload = json.load(fh)
    for a in payload["annotations"]:
        dets.append(dict(image_id=a["image_id"], category_id=1,
                         keypoints=a["keypoints"], score=0.99,
                         track_id=a["track_id"]))
    res = evaluate_dataset(ds, dets)
    assert res["posetrack/Mean"] > 99.0, res


def test_generator_deterministic(tmp_path):
    a1 = generate_posetrack_dataset(str(tmp_path / "a"), num_videos=2,
                                    frames_per_video=2, height=96,
                                    width=128, seed=3)
    a2 = generate_posetrack_dataset(str(tmp_path / "b"), num_videos=2,
                                    frames_per_video=2, height=96,
                                    width=128, seed=3)
    with open(a1) as f1, open(a2) as f2:
        assert json.load(f1) == json.load(f2)


def test_people_visibly_rendered(tmp_path):
    """Rendered frames must differ from the background where people are
    (the model can only learn pose if appearance encodes the keypoints)."""
    import cv2
    root = str(tmp_path / "synth")
    ann = generate_posetrack_dataset(root, num_videos=1,
                                     frames_per_video=1, height=128,
                                     width=192, max_persons=2, seed=0)
    with open(ann) as fh:
        payload = json.load(fh)
    img = cv2.imread(root + "/" + payload["images"][0]["file_name"])
    assert img is not None
    for a in payload["annotations"]:
        k = np.asarray(a["keypoints"], np.float32).reshape(15, 3)
        vis = k[:, 2] > 0
        pts = k[vis, :2].astype(int)
        pts[:, 0] = pts[:, 0].clip(0, 191)
        pts[:, 1] = pts[:, 1].clip(0, 127)
        # limbs are thick: a 5px neighborhood around each visible joint
        # must not be flat background everywhere
        hit = 0
        for x, y in pts:
            patch = img[max(0, y - 5):y + 6, max(0, x - 5):x + 6]
            if patch.std() > 8:
                hit += 1
        assert hit >= vis.sum() * 0.6, (hit, vis.sum())
