"""Dataset + pipeline tests on synthetic PoseTrack-style data."""
import json
import os

import numpy as np
import pytest

from pavenet_tpu.datasets import PosetrackVideoPoseDataset, ClipLoader
from pavenet_tpu.datasets.pipelines import (
    build_train_pipeline, build_test_pipeline)


@pytest.fixture(scope="module")
def synth_posetrack(tmp_path_factory):
    root = tmp_path_factory.mktemp("pt17")
    video = root / "videos" / "000001_bonn"
    video.mkdir(parents=True)
    import cv2
    rng = np.random.RandomState(0)
    nframes = 5
    H, W = 120, 160
    for i in range(1, nframes + 1):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(video / f"{i:08d}.jpg"), img)
    images, annotations = [], []
    aid = 1
    for i in range(1, nframes + 1):
        labeled = i in (2, 3)
        images.append(dict(
            id=i, file_name=f"videos/000001_bonn/{i:08d}.jpg",
            width=W, height=H, nframes=nframes, frame_id=i,
            is_labeled=labeled, vid_id="000001"))
        if labeled:
            for p in range(2):
                k = np.zeros((15, 3), np.float32)
                k[:, 0] = rng.uniform(10, W - 10, 15)
                k[:, 1] = rng.uniform(10, H - 10, 15)
                k[:, 2] = 2
                annotations.append(dict(
                    id=aid, image_id=i, category_id=1,
                    keypoints=k.reshape(-1).tolist(),
                    bbox=[10, 10, 60, 80], area=4800,
                    num_keypoints=15, iscrowd=0, track_id=p))
                aid += 1
    ann = dict(images=images, annotations=annotations,
               categories=[dict(id=1, name="person")])
    ann_file = root / "train.json"
    ann_file.write_text(json.dumps(ann))
    return str(ann_file), str(root)


def test_clip_assembly_and_pipeline(synth_posetrack):
    ann_file, root = synth_posetrack
    ds = PosetrackVideoPoseDataset(
        ann_file, img_prefix=root, num_frames=3,
        pipeline=build_train_pipeline(
            scale_range=((128, 192), (192, 192)),
            buckets=((256, 256),)))
    assert len(ds) == 2  # only labeled frames
    # clip of frame 2: prev=1, now=2, next=3
    assert ds.data_infos[0]["frame_files"] == [
        "videos/000001_bonn/00000001.jpg",
        "videos/000001_bonn/00000002.jpg",
        "videos/000001_bonn/00000003.jpg"]
    s = ds[0]
    assert s is None or (
        s["img"].shape == (3, 256, 256, 3)
        and s["gt_keypoints"].ndim == 3)


def test_loader_batches(synth_posetrack):
    ann_file, root = synth_posetrack
    ds = PosetrackVideoPoseDataset(
        ann_file, img_prefix=root, num_frames=3,
        pipeline=build_test_pipeline(img_scale=(192, 128),
                                     buckets=((192, 256),)))
    loader = ClipLoader(ds, batch_size=2, max_gt=6, shuffle=False,
                        prefetch=0, drop_last=False)
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b["img"].shape == (2, 3, 192, 256, 3)
    assert b["gt_keypoints"].shape == (2, 6, 15, 3)
    assert b["gt_valid"].sum() == 4  # 2 gts per image
    assert b["img_shape"].tolist() == [[128, 171], [128, 171]]


def test_boundary_clamping(synth_posetrack):
    ann_file, root = synth_posetrack
    ds = PosetrackVideoPoseDataset(ann_file, img_prefix=root, num_frames=5)
    # frame 2 with T=5: indices clamped to [1, 5] -> 1,1,2,3,4 wait:
    # 2-2=0 -> 1; 2-1=1; 2; 3; 4
    assert [f.split("/")[-1] for f in ds.data_infos[0]["frame_files"]] == [
        "00000001.jpg", "00000001.jpg", "00000002.jpg",
        "00000003.jpg", "00000004.jpg"]
