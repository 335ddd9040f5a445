"""HRNet backbone: shapes + activation parity vs mmdet's HRNet
(``mmdet/models/backbones/hrnet.py``), weight-converted."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pavenet_tpu.models.backbones.hrnet import HRNet, HRNET_EXTRA


def test_hrnet_shapes():
    model = HRNet(width=32)
    x = np.random.RandomState(0).randn(1, 64, 96, 3).astype(np.float32)
    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()
    outs = jax.jit(lambda v: model.apply(v, x))(v)
    assert [o.shape for o in outs] == [
        (1, 16, 24, 32), (1, 8, 12, 64), (1, 4, 6, 128), (1, 2, 3, 256)]


def test_hrnet_parity_with_mmdet():
    torch = pytest.importorskip("torch")
    import sys
    from reference_oracle import install_stubs, REFERENCE_ROOT
    install_stubs()
    for p in (f"{REFERENCE_ROOT}/third_party/mmdetection", REFERENCE_ROOT):
        if p not in sys.path:
            sys.path.insert(0, p)
    from mmdet.models.backbones.hrnet import HRNet as RefHRNet
    from pavenet_tpu.utils.weight_convert import _hrnet, _StateDict

    width = 32
    stages = HRNET_EXTRA[width]
    extra = {}
    for i, (block, nm, nb, nc) in enumerate(stages, start=1):
        extra[f"stage{i}"] = dict(
            num_modules=nm, num_branches=len(nc),
            block=block.upper(), num_blocks=tuple(nb),
            num_channels=tuple(nc))
    torch.manual_seed(0)
    ref = RefHRNet(extra=extra, in_channels=3, norm_eval=True)
    ref.init_weights()
    ref.eval()

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        outs_t = ref(torch.from_numpy(x))

    sd = _StateDict({f"backbone.{k}": v.numpy()
                     for k, v in ref.state_dict().items()})
    params, stats = _hrnet(sd, width=width)
    unused = [k for k in sd.unused()
              if not k.endswith("num_batches_tracked")]
    assert not unused, unused[:8]

    mine = HRNet(width=width)
    outs = jax.jit(lambda v, x: mine.apply(v, x))(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    # the fork's HRNet returns y_list[1:] (drops the stride-4 branch,
    # ``mmdet/models/backbones/hrnet.py:583``); the flax module returns
    # all 4 and the detector slices via backbone_out_indices
    assert len(outs_t) == 3 and len(outs) == 4
    for i, (got, want) in enumerate(zip(outs[1:], outs_t)):
        want = want.numpy().transpose(0, 2, 3, 1)
        assert got.shape == want.shape, (i, got.shape, want.shape)
        # random-init activations explode through HRNet's unnormalized
        # fuse sums (stage-3 maxima ~1e5), so compare relatively
        diff = np.abs(np.asarray(got) - want).max()
        rel = diff / max(np.abs(want).max(), 1.0)
        assert rel < 1e-5, (i, diff, rel)
