"""OKS-NMS keep mask vs a straightforward numpy greedy reference."""
import numpy as np

from pavenet_tpu.ops import oks_nms_keep

SIGMAS = np.array([.26, .79, .79, .79, .79, .72, .72, .62, .62, 1.07, 1.07,
                   .87, .87, .89, .89], np.float32) / 10.0


def np_oks(g, d, ag, ad, sigmas):
    var = (sigmas * 2) ** 2
    e = ((g[:, 0] - d[:, 0]) ** 2 + (g[:, 1] - d[:, 1]) ** 2) / var / (
        (ag + ad) / 2 + np.spacing(1)) / 2
    return np.exp(-e).mean()


def np_greedy(kpts, scores, areas, thresh):
    order = np.argsort(-scores)
    keep = np.zeros(len(scores), bool)
    for idx, i in enumerate(order):
        ok = True
        for j in order[:idx]:
            if keep[j] and np_oks(kpts[i], kpts[j], areas[i], areas[j],
                                  SIGMAS) > thresh:
                ok = False
                break
        keep[i] = ok
    return keep


def test_matches_numpy_greedy():
    rng = np.random.RandomState(3)
    for trial in range(5):
        n, k = 20, 15
        centers = rng.rand(n, 1, 2) * 300
        kpts = centers + rng.randn(n, k, 2) * 20
        scores = rng.rand(n).astype(np.float32)
        areas = ((kpts[..., 0].max(1) - kpts[..., 0].min(1)) *
                 (kpts[..., 1].max(1) - kpts[..., 1].min(1)))
        want = np_greedy(kpts, scores, areas, 0.45)
        got = np.asarray(oks_nms_keep(
            kpts.astype(np.float32), scores, areas.astype(np.float32),
            SIGMAS, 0.45))
        np.testing.assert_array_equal(got, want)
