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


def _np_greedy_box_nms(boxes, scores, iou_thr, score_thr=0.0):
    import numpy as np

    def iou(a, b):
        ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
        ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
        ua = ((a[2] - a[0]) * (a[3] - a[1])
              + (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return inter / max(ua, 1e-9)

    order = np.argsort(-scores)
    keep = np.zeros(len(scores), bool)
    for i in order:
        if scores[i] <= score_thr:
            continue
        if any(keep[j] and iou(boxes[i], boxes[j]) > iou_thr
               for j in range(len(scores)) if scores[j] > scores[i]
               or (scores[j] == scores[i] and j != i and keep[j]
                   and list(order).index(j) < list(order).index(i))):
            continue
        keep[i] = True
    return keep


def test_box_nms_matches_numpy_greedy():
    import numpy as np
    from pavenet_tpu.ops.nms import box_nms_keep

    rng = np.random.RandomState(0)
    for _ in range(5):
        n = 24
        xy = rng.uniform(0, 80, (n, 2))
        wh = rng.uniform(5, 40, (n, 2))
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        got = np.asarray(box_nms_keep(boxes, scores, 0.5, 0.1))
        want = _np_greedy_box_nms(boxes, scores, 0.5, 0.1)
        assert (got == want).all(), (got, want)


def test_soft_nms_scores():
    import numpy as np
    from pavenet_tpu.ops.nms import soft_nms_scores

    # two heavy overlaps + one separate box
    boxes = np.array([[0, 0, 10, 10], [1, 0, 11, 10], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    out = np.asarray(soft_nms_scores(boxes, scores, iou_thr=0.3))
    iou01 = (9 * 10) / (10 * 10 + 10 * 10 - 9 * 10)
    assert abs(out[0] - 0.9) < 1e-6          # top box untouched
    assert abs(out[1] - 0.8 * (1 - iou01)) < 1e-5
    assert abs(out[2] - 0.7) < 1e-6          # disjoint box untouched


def test_flip_images_respects_padding():
    import numpy as np
    import jax.numpy as jnp
    from pavenet_tpu.models.detectors.videopose import VideoPoseDetector

    det = VideoPoseDetector()
    img = np.zeros((1, 1, 2, 8, 3), np.float32)
    img[0, 0, :, :5, 0] = np.arange(5)       # valid width = 5, rest pad
    batch = {"img": jnp.asarray(img),
             "img_shape": jnp.asarray([[2, 5]], jnp.int32)}
    out = np.asarray(VideoPoseDetector._flip_images(det, batch)["img"])
    assert (out[0, 0, 0, :5, 0] == np.array([4, 3, 2, 1, 0])).all()
    assert (out[0, 0, 0, 5:, 0] == 0).all()  # padding untouched
