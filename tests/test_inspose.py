"""InsPose single-stage pose detector smoke tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pavenet_tpu.models.detectors.inspose import InsPoseDetector


@pytest.fixture(scope="module")
def inspose_setup():
    model = InsPoseDetector(
        num_keypoints=17, max_gt=4, backbone_depth=18, feat_channels=32,
        feat_channels_kpt=32, feat_channels_hm=32, shared_channels=32,
        stacked_convs=1, stacked_convs_kpt=1, stacked_convs_hm=1,
        max_per_img=5)
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
    # reference loss-dict keys (``inspose_head.py:537-549``)
    assert {"loss", "loss_cls", "loss_keypoint", "loss_keypoint_reg",
            "loss_heatmap", "loss_ae_pull", "loss_ae_push",
            "loss_heatmap_offset"} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_inspose_inference(inspose_setup):
    model, variables, batch = inspose_setup
    out = jax.jit(lambda v: model.apply(v, batch, train=False))(variables)
    assert out["det_kpts"].shape == (1, 5, 17, 3)
    assert out["det_bboxes"].shape == (1, 5, 5)
    assert np.isfinite(np.asarray(out["det_kpts"])).all()


def test_fcos_assignment_matches_reference():
    """Differential test of the vectorized FCOS assignment (center
    sampling + regress ranges + min-area) vs the reference
    ``InsPoseHead._get_target_single`` (``inspose_head.py:831-913``) on
    identical inputs."""
    import sys
    import pytest as _pytest
    torch = _pytest.importorskip("torch")
    sys.path.insert(0, "/root/repo/tests")
    from reference_oracle import install_stubs, REFERENCE_ROOT
    install_stubs()
    for p in (f"{REFERENCE_ROOT}/third_party/mmdetection", REFERENCE_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    import opera.models  # registry side effects # noqa: F401
    from opera.models.dense_heads.inspose_head import InsPoseHead

    strides = (8, 16, 32)
    ranges = ((-1, 64), (64, 128), (128, 1e8))
    ref_head = InsPoseHead(
        num_classes=1, in_channels=32, feat_channels=32, stacked_convs=1,
        norm_cfg=dict(type='GN', num_groups=8, requires_grad=True),
        num_keypoints=17, strides=strides, regress_ranges=ranges,
        center_sampling=True, center_sample_radius=1.5,
        loss_cls=dict(type='mmdet.VarifocalLoss', use_sigmoid=True),
        loss_bbox=dict(type='mmdet.IoULoss', loss_weight=1.0),
        loss_hm=dict(type='opera.CenterFocalLoss'))

    rng = np.random.RandomState(0)
    # multi-level point grid like the model's flatten
    pts, strd, npl = [], [], []
    for s in strides:
        h, w = 64 // s, 96 // s
        yy, xx = np.meshgrid((np.arange(h) + 0.5) * s,
                             (np.arange(w) + 0.5) * s, indexing="ij")
        p = np.stack([xx, yy], -1).reshape(-1, 2)
        pts.append(p)
        strd.append(np.full(len(p), s, np.float32))
        npl.append(len(p))
    points = np.concatenate(pts).astype(np.float32)
    strides_flat = np.concatenate(strd)
    G = 5
    boxes = np.zeros((G, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 60, G)
    boxes[:, 1] = rng.uniform(0, 40, G)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(8, 90, G)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(8, 60, G)

    rr = np.concatenate([
        np.tile(np.array(r, np.float32)[None], (n, 1))
        for r, n in zip(ranges, npl)])
    labels_t, _, min_inds_t = ref_head._get_target_single(
        torch.from_numpy(boxes), torch.zeros(G, dtype=torch.long),
        torch.zeros(G, 17 * 3), torch.from_numpy(points),
        torch.from_numpy(rr), npl)
    pos_ref = (labels_t.numpy() == 0)
    gt_ref = min_inds_t.numpy()

    det = InsPoseDetector(num_keypoints=17, strides=strides,
                          regress_ranges=ranges, center_sampling=True,
                          center_sample_radius=1.5)
    gt_idx, pos = InsPoseDetector._assign(
        det, jnp.asarray(points), jnp.asarray(strides_flat),
        jnp.asarray(boxes), jnp.ones(G, bool))
    pos = np.asarray(pos)
    gt_idx = np.asarray(gt_idx)
    assert (pos == pos_ref).all(), (pos.sum(), pos_ref.sum())
    assert (gt_idx[pos] == gt_ref[pos_ref]).all()
