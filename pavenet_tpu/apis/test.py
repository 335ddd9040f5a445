"""Evaluation loop: run inference over a dataset, collect detections, eval.

Rebuilds ``opera/apis/test.py`` (single/multi-gpu test + result collection)
for the jit world: one compiled inference function per image bucket, padded
detections filtered on host by the NMS keep mask, results fed to the
self-contained COCO/PoseTrack evaluators (the reference gathered ranks via
tmpdir pickles / all_gather; under SPMD the loop shards naturally by
feeding each host its slice).
"""
from __future__ import annotations

import time
from collections import OrderedDict
from typing import List

import numpy as np
import jax


from .prep import IMG_NORM_MEAN, IMG_NORM_STD, make_device_prep

_make_prep = make_device_prep


def _rescale_batch(batch, ratio: float) -> dict:
    """Host-side scale augmentation for multi-scale TTA: resize each
    sample's valid region by ``ratio`` and re-pad to the smallest static
    bucket (the reference expresses this in the ``MultiScaleFlipAug``
    test pipeline; here the already-loaded batch is re-scaled so every
    pass shares one data pass)."""
    import cv2
    from ..datasets.pipelines.transforms import DEFAULT_BUCKETS
    if ratio == 1.0:
        return batch
    img = np.asarray(batch["img"])                  # (B, T, H, W, 3)
    shapes = np.asarray(batch["img_shape"])
    new_shapes = np.maximum((shapes * ratio).round().astype(np.int32), 1)
    nh_max, nw_max = new_shapes.max(0)
    for bh, bw in sorted(DEFAULT_BUCKETS, key=lambda b: b[0] * b[1]):
        if bh >= nh_max and bw >= nw_max:
            break
    else:
        raise ValueError(f"scaled image {nh_max}x{nw_max} exceeds buckets")
    out = np.zeros(img.shape[:2] + (bh, bw, 3), img.dtype)
    for b in range(img.shape[0]):
        ih, iw = shapes[b]
        nh, nw = new_shapes[b]
        for t in range(img.shape[1]):
            out[b, t, :nh, :nw] = cv2.resize(
                img[b, t, :ih, :iw], (int(nw), int(nh)),
                interpolation=cv2.INTER_LINEAR)
    return dict(batch, img=out, img_shape=new_shapes,
                scale_factor=np.asarray(batch["scale_factor"]) * ratio)


def run_inference(model, variables, loader, score_thr: float = 0.0,
                  logger=None, flip_test: bool = False,
                  mesh=None, aug_scales=None,
                  img_norm=(IMG_NORM_MEAN, IMG_NORM_STD)) -> List[dict]:
    """Returns COCO-style keypoint detection dicts.

    ``flip_test`` merges original + horizontally-flipped predictions via
    box NMS (the reference's ``aug_test``, ``videoposev1.py:224``).

    ``aug_scales``: optional list of scale ratios for multi-scale TTA —
    every (scale, flip) pass runs separately and the union is merged with
    the reference ``merge_aug_results`` + ``multiclass_nms`` semantics
    (``videoposev1.py:224-262``).

    ``mesh``: optional single-process device mesh — the batch axis of each
    loader batch is sharded over its devices (inference data parallelism
    over local chips; the reference's multi-GPU test instead ran one
    process per GPU).  Feed a loader whose batch size is a multiple of the
    mesh size; padded tail rows are dropped by ``_row_valid`` as usual."""
    if mesh is not None:
        from ..parallel.mesh import put_batch, replicate
        variables = jax.device_put(variables, replicate(mesh))
    else:
        # stage the variables on device ONCE: a checkpoint-restored tree
        # is host numpy, and numpy jit arguments re-transfer on EVERY
        # call — ~166 MB/clip over the axon tunnel for the flagship,
        # the dominant term of the round-4/5 eval-CLI host overhead
        # (PERF_NOTES "Round 5: eval CLI decomposition")
        variables = jax.device_put(variables)
    prep = _make_prep(img_norm)
    multi_scale = bool(aug_scales) and (
        len(aug_scales) > 1 or float(aug_scales[0]) != 1.0)
    if multi_scale:
        flips = (False, True) if flip_test else (False,)
        aug_fns = {f: jax.jit(lambda v, b, f=f: model.apply(
            v, prep(b), flip=f, method="forward_test_aug"))
            for f in flips}
        merge_fn = jax.jit(lambda v, outs: model.apply(
            v, outs, method="merge_aug_detections"))

        def infer(v, feed):
            outs = []
            for r in aug_scales:
                fb = _rescale_batch(feed, float(r))
                if mesh is not None:
                    fb = put_batch(fb, mesh)
                for f in flips:
                    outs.append(aug_fns[f](v, fb))
            return merge_fn(v, outs)
    elif flip_test:
        infer = jax.jit(lambda v, b: model.apply(
            v, prep(b), method="forward_test_flip"))
    else:
        infer = jax.jit(lambda v, b: model.apply(v, prep(b), train=False))

    # pack the four detection fields into ONE flat f32 array in-jit and
    # fetch it with a single host round trip: each per-array np.asarray
    # over the axon tunnel costs a full RTT (~70 ms measured), and the
    # 4-field fetch was 291 of the ~306 ms/clip steady-state eval loop
    # (PERF_NOTES "Round 5: eval CLI decomposition").  The multi-scale
    # TTA branch keeps the per-field fetch (its host-side rescale defeats
    # shape tracing).
    import jax.numpy as jnp

    def _packed(v, b):
        out = infer(v, b)
        B = out["det_kpts"].shape[0]
        return jnp.concatenate(
            [out["det_kpts"].reshape(B, -1).astype(jnp.float32),
             out["det_bboxes"].reshape(B, -1).astype(jnp.float32),
             out["det_labels"].astype(jnp.float32),
             out["keep"].astype(jnp.float32)], axis=-1)

    packed = None if multi_scale else jax.jit(_packed)
    shapes = None  # per-field ShapeDtypeStructs, traced once (no device work)

    def unpack(flat):
        o, out = 0, {}
        for k in ("det_kpts", "det_bboxes", "det_labels", "keep"):
            s = shapes[k].shape
            size = int(np.prod(s[1:]))
            field = flat[:, o:o + size].reshape(flat.shape[0], *s[1:])
            o += size
            out[k] = field.astype(shapes[k].dtype)
        return out

    detections: List[dict] = []
    t_total, t_first, n_clips, n_steady = 0.0, None, 0, 0

    def emit(out, batch):
        row_valid = batch.get("_row_valid",
                              np.ones(len(batch["img"]), bool))
        for b in range(len(batch["img"])):
            if not row_valid[b]:   # repeat-padded tail row — skip
                continue
            keep = out["keep"][b]
            kpts = out["det_kpts"][b]          # (M, K, 3)
            scores = out["det_bboxes"][b, :, 4]
            for m in np.where(keep)[0]:
                if scores[m] < score_thr:
                    continue
                detections.append(dict(
                    image_id=int(batch["image_id"][b]),
                    category_id=1,
                    keypoints=kpts[m].reshape(-1).astype(float).tolist(),
                    score=float(scores[m]),
                ))

    # double-buffered loop: dispatch clip N+1 (async) before fetching
    # clip N's packed detections, hiding the fetch round trip behind the
    # next clip's device time.  The TTA branch stays synchronous.
    pending = None  # (device handle, source batch)
    t0 = time.time()
    for batch in loader:
        feed = {k: batch[k] for k in ("img", "img_shape", "scale_factor")}
        if mesh is not None and not multi_scale:
            feed = put_batch(feed, mesh)
        if packed is None:
            out = jax.tree.map(np.asarray, infer(variables, feed))
            emit(out, batch)
        else:
            if shapes is None:
                shapes = jax.eval_shape(infer, variables, feed)
            handle = packed(variables, feed)
            if pending is not None:
                emit(unpack(np.asarray(pending[0])), pending[1])
            pending = (handle, batch)
        dt, t0 = time.time() - t0, time.time()
        if t_first is None:
            t_first = dt          # includes compile; reported separately
        else:
            t_total += dt
            n_steady += len(batch["img"])
        n_clips += len(batch["img"])
    if pending is not None:
        emit(unpack(np.asarray(pending[0])), pending[1])
    if logger is not None and n_clips:
        steady = (t_total / n_steady * 1e3 if n_steady
                  else (t_first or 0.0) * 1e3)
        logger.info(f"inference: {n_clips} clips, "
                    f"{steady:.1f} ms/clip steady-state (incl. host; "
                    f"first clip {t_first:.1f}s incl. compile)")
    return detections


def run_det_inference(model, variables, loader, score_thr: float = 0.05,
                      mask_thr: float = 0.5, logger=None,
                      mesh=None) -> List[dict]:
    """Detection / instance-segmentation inference (SOIT, DK-DETR):
    returns COCO-style dicts with ``bbox`` (xywh) and, when the model
    emits masks, ``segmentation`` as a binary mask resized to the
    original image (reference ``soit_head.py:_get_bboxes_single`` resize
    + threshold semantics)."""
    try:
        import cv2
    except ImportError:  # pragma: no cover
        cv2 = None
    infer = jax.jit(lambda v, b: model.apply(v, b, train=False))
    if mesh is not None:
        from ..parallel.mesh import put_batch, replicate
        variables = jax.device_put(variables, replicate(mesh))
    else:
        variables = jax.device_put(variables)  # once, not per clip
    detections: List[dict] = []
    for batch in loader:
        keys = ("img", "img_shape", "scale_factor")
        feed = {k: batch[k] for k in keys if k in batch}
        if "text_feats" in batch:
            feed["text_feats"] = batch["text_feats"]
        if mesh is not None:
            tf = feed.pop("text_feats", None)  # replicated, not sharded
            feed = put_batch(feed, mesh)
            if tf is not None:
                feed["text_feats"] = jax.device_put(tf, replicate(mesh))
        out = jax.tree.map(np.asarray, infer(variables, feed))
        row_valid = batch.get("_row_valid",
                              np.ones(len(batch["img"]), bool))
        for b in range(len(batch["img"])):
            if not row_valid[b]:
                continue
            scores = out["det_bboxes"][b, :, 4]
            boxes = out["det_bboxes"][b, :, :4]
            labels = out["det_labels"][b]
            masks = out.get("det_masks")
            sf = np.asarray(batch["scale_factor"][b])
            ih, iw = np.asarray(batch["img_shape"][b])
            ori_w = int(round(iw / sf[0]))
            ori_h = int(round(ih / sf[1]))
            for m in np.where(scores >= score_thr)[0]:
                x1, y1, x2, y2 = boxes[m]
                det = dict(
                    image_id=int(batch["image_id"][b]),
                    category_id=int(labels[m]) + 1,
                    bbox=[float(x1), float(y1),
                          float(x2 - x1), float(y2 - y1)],
                    score=float(scores[m]))
                if masks is not None and cv2 is not None:
                    # masks are at input/2 resolution over the padded
                    # bucket; crop the valid region, resize to original
                    mk = masks[b, m]
                    h2 = int(np.ceil(ih / (batch["img"].shape[-3] /
                                           mk.shape[0])))
                    w2 = int(np.ceil(iw / (batch["img"].shape[-2] /
                                           mk.shape[1])))
                    mk = mk[:h2, :w2]
                    mk = cv2.resize(mk.astype(np.float32),
                                    (ori_w, ori_h),
                                    interpolation=cv2.INTER_LINEAR)
                    det["segmentation"] = mk >= mask_thr
                detections.append(det)
    if logger is not None:
        logger.info(f"det inference: {len(detections)} detections")
    return detections


def gather_detections(detections: List[dict]) -> List[dict]:
    """All-gather detection dicts across processes (the reference's
    ``collect_results_gpu``, ``opera/apis/test.py:247`` — rank tensors
    all-gathered after pickle-padding; here json bytes padded to the max
    payload size and gathered with ``multihost_utils``).

    Single-process: identity.
    """
    if jax.process_count() == 1:
        return detections
    import json
    from jax.experimental import multihost_utils

    payload = np.frombuffer(
        json.dumps(detections).encode("utf-8"), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([payload.size], np.int64))
    maxlen = int(sizes.max())
    padded = np.zeros(maxlen, np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    out: List[dict] = []
    for p in range(gathered.shape[0]):
        n = int(np.asarray(sizes).reshape(-1)[p])
        out.extend(json.loads(bytes(gathered[p][:n]).decode("utf-8")))
    return out


def evaluate_dataset(dataset, detections: List[dict],
                     metric: str = "keypoints",
                     max_dets: int = 30) -> "OrderedDict":
    """COCO OKS AP + (for PoseTrack) per-joint PCKh AP."""
    from ..core.eval.coco_keypoint_eval import COCOKeypointEval

    results = OrderedDict()
    if detections and "keypoints" not in detections[0]:
        # detection/instance-seg models (SOIT, DK-DETR, Objects365);
        # protocol-specific datasets (LVIS federated, VOC mAP) own their
        # evaluator
        if hasattr(dataset, "evaluate_detections"):
            return dataset.evaluate_detections(detections)
        from ..core.eval.coco_det_eval import COCODetEval
        dt = dataset.coco.load_res(detections)
        bbox_res = COCODetEval(dataset.coco, dt, iou_type="bbox").evaluate()
        results.update({f"bbox/{k}": v for k, v in bbox_res.items()})
        if "segmentation" in detections[0]:
            segm_res = COCODetEval(dataset.coco, dt,
                                   iou_type="segm").evaluate()
            results.update({f"segm/{k}": v for k, v in segm_res.items()})
        return results
    if detections:
        dt = dataset.coco.load_res(detections)
        sigmas = None
        num_k = getattr(dataset, "NUM_KEYPOINTS", 17)
        from ..models.losses.oks_loss import OKS_SIGMAS
        sigmas = OKS_SIGMAS.get(num_k)
        if getattr(dataset, "EVAL_PROTOCOL", "coco") == "crowdpose":
            # CrowdPose protocol (xtcocotools 'keypoints_crowd',
            # reference ``crowd_pose.py:286-295``): maxDets=20,
            # use_area=False, crowd-index bands
            from ..core.eval.coco_keypoint_eval import CrowdPoseKeypointEval
            crowd_res = CrowdPoseKeypointEval(
                dataset.coco, dt, sigmas=sigmas).evaluate()
            results.update(
                {f"keypoints_{k}": v for k, v in crowd_res.items()})
            return results
        coco_res = COCOKeypointEval(
            dataset.coco, dt, sigmas=sigmas, max_dets=max_dets).evaluate()
        results.update({f"coco/{k}": v for k, v in coco_res.items()})
    if getattr(dataset, "EVAL_PROTOCOL", "coco") == "posetrack":
        from ..core.eval.posetrack_eval import (
            evaluate_posetrack_ap, frames_from_coco)
        frames = frames_from_coco(dataset.coco, detections,
                                  max_dets=max_dets)
        pt = evaluate_posetrack_ap(frames)
        for k, v in pt.items():
            if k != "per_joint":
                results[f"posetrack/{k}"] = v
        # MOTA needs per-detection track ids (an external/user tracker;
        # the reference evaluates AP only, eval_track=False at
        # ``posetrack_video_pose.py:512``, but ships the capability)
        if detections and all("track_id" in d for d in detections):
            from ..core.eval.posetrack_track_eval import (
                evaluate_posetrack_mota)
            mot = evaluate_posetrack_mota(
                frames, [fr["seq_id"] for fr in frames])
            for k, v in mot.items():
                if k != "mota_per_joint":
                    results[f"posetrack/{k}"] = v
    return results
