"""InsPose single-stage pose detector smoke tests."""
import numpy as np
import pytest
import jax

from pavenet_tpu.models.detectors.inspose import InsPoseDetector


@pytest.fixture(scope="module")
def inspose_setup():
    model = InsPoseDetector(
        num_keypoints=17, max_gt=4, backbone_depth=18, feat_channels=32,
        shared_channels=32, stacked_convs=1, max_per_img=5)
    rng = np.random.RandomState(0)
    B, H, W, G, K = 1, 64, 96, 4, 17
    boxes = np.zeros((B, G, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, 30, (B, G))
    boxes[..., 1] = rng.uniform(0, 20, (B, G))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(20, 60, (B, G))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(20, 40, (B, G))
    kpts = np.zeros((B, G, K, 3), np.float32)
    kpts[..., 0] = rng.uniform(0, W, (B, G, K))
    kpts[..., 1] = rng.uniform(0, H, (B, G, K))
    kpts[..., 2] = 2
    batch = dict(
        img=rng.randn(B, H, W, 3).astype(np.float32),
        img_shape=np.array([[H, W]], np.int32),
        scale_factor=np.ones((B, 2), np.float32),
        gt_boxes=boxes,
        gt_keypoints=kpts,
        gt_valid=np.array([[True, True, False, False]]),
    )
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0)}, batch, train=True))()
    return model, variables, batch


def test_inspose_train_losses(inspose_setup):
    model, variables, batch = inspose_setup
    losses = jax.jit(lambda v: model.apply(v, batch, train=True))(variables)
    assert {"loss", "loss_cls", "loss_offset", "loss_hm"} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_inspose_inference(inspose_setup):
    model, variables, batch = inspose_setup
    out = jax.jit(lambda v: model.apply(v, batch, train=False))(variables)
    assert out["det_kpts"].shape == (1, 5, 17, 3)
    assert out["det_bboxes"].shape == (1, 5, 5)
    assert np.isfinite(np.asarray(out["det_kpts"])).all()
