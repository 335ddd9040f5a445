"""Single-image/clip inference API (reference: ``opera/apis/inference.py``).

``init_detector(config, checkpoint)`` -> (model, variables);
``inference_detector(model, variables, imgs)`` -> detections for one clip.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from ..config import Config
from ..models.builder import build_detector
from ..datasets.pipelines.transforms import (
    Resize, Normalize, PadToBucket, FormatBatch, Compose, LoadClip,
    DEFAULT_BUCKETS)


def init_detector(config: Union[str, Config],
                  checkpoint: Optional[str] = None,
                  dtype: Optional[str] = None):
    """Build a detector from config (+ optional checkpoint).

    ``dtype``: 'f32'/'bf16' compute-dtype override; None follows the
    config's ``act_dtype`` key (float32 parity default).
    """
    from ..models.builder import resolve_act_dtype
    if isinstance(config, str):
        config = Config.fromfile(config)
    model = build_detector(config.model,
                           dtype=resolve_act_dtype(config, dtype))
    variables = None
    if checkpoint is not None:
        if checkpoint.endswith(".pth"):
            from ..utils.weight_convert import (
                load_torch_checkpoint, convert_videopose_state_dict)
            sd = load_torch_checkpoint(checkpoint)
            variables = convert_videopose_state_dict(
                sd, num_frames=model.num_frames,
                num_decoder_layers=model.num_decoder_layers,
                num_refine_layers=model.num_refine_layers,
                num_encoder_layers=model.num_encoder_layers,
                backbone_depth=model.backbone_depth)
            variables.pop("_unused_reference_keys", None)
        else:
            import jax
            from ..apis.train import create_train_state
            from ..utils.checkpoint import restore_checkpoint
            from ..models.zoo import dummy_clip_batch
            rng = np.random.RandomState(0)
            # the param tree does not depend on the GT pad; clamp to
            # num_query so the Hungarian assigner's R <= C holds even for
            # small-query debug configs
            dummy = dummy_clip_batch(
                rng, num_frames=model.num_frames, height=256, width=448,
                num_keypoints=model.num_keypoints,
                max_gt=min(model.max_gt, model.num_query), train=True)
            state, _ = create_train_state(model, dummy, seed=0)
            state = restore_checkpoint(checkpoint, state)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
    import jax
    # stage on device once: numpy jit args re-transfer per call (the
    # flagship tree is ~166 MB — per-call transfer dominates on a
    # tunneled chip)
    return model, jax.device_put(variables)


def inference_detector(model, variables, imgs: Union[str, Sequence],
                       img_scale=(1333, 800)):
    """Run a single clip (paths or loaded RGB arrays) through the model.

    Returns dict with det_kpts (M, K, 3), det_bboxes (M, 5), keep (M,).
    """
    import jax

    if isinstance(imgs, (str, np.ndarray)):
        imgs = [imgs] * model.num_frames
    if isinstance(imgs[0], str):
        results = {"frame_files": list(imgs)}
        results = LoadClip()(results)
    else:
        results = {
            "imgs": [np.asarray(im, np.float32) for im in imgs],
            "img_shape": np.asarray(imgs[0]).shape[:2],
            "ori_shape": np.asarray(imgs[0]).shape[:2],
            "scale_factor": np.array([1.0, 1.0], np.float32),
        }
    pipe = Compose([Resize([img_scale], multiscale_mode="value"),
                    Normalize(), PadToBucket(DEFAULT_BUCKETS),
                    FormatBatch()])
    sample = pipe(results)
    batch = {k: np.asarray(v)[None] for k, v in sample.items()
             if k in ("img", "img_shape", "scale_factor")}
    infer = _infer_jit_cache.get(id(model))
    if infer is None:
        infer = jax.jit(lambda v, b: model.apply(v, b, train=False))
        _infer_jit_cache[id(model)] = infer
    out = infer(variables, batch)
    out = jax.tree.map(lambda x: np.asarray(x)[0], out)
    return out


# per-model jit cache: a fresh lambda per call would re-trace every
# invocation (the persistent XLA cache removes the compile, not the trace)
_infer_jit_cache: dict = {}
