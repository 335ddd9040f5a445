#!/usr/bin/env python
"""Evaluate a checkpoint on a dataset (reference surface: ``tools/test.py``).

Usage:
    python tools/test.py <config.py> <checkpoint> [--eval keypoints]
        [--out results.json] [--format-only] [--show-dir DIR]
        [--show-score-thr S] [--flip-test] [--aug-scales 1.0 0.75]
        [--cfg-options k=v ...]

Dispatches on the model family: pose models (PAVE-Net video / PETR) run
the keypoint path; SOIT / InsPose / DK-DETR run the detection /
instance-segmentation path (boxes + masks).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax
    jax.config.update("jax_platforms", "cpu")


def parse_args():
    p = argparse.ArgumentParser(description="Test a model")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--eval", default="keypoints")
    p.add_argument("--flip-test", action="store_true",
                   help="test-time horizontal-flip merge (reference "
                        "aug_test, videoposev1.py:224)")
    p.add_argument("--aug-scales", type=float, nargs="+", default=None,
                   help="multi-scale TTA ratios (merged with "
                        "merge_aug_results semantics; combine with "
                        "--flip-test for scales x flip)")
    p.add_argument("--out", default=None,
                   help="dump detections json")
    p.add_argument("--format-only", action="store_true",
                   help="dump --out without evaluating (reference "
                        "tools/test.py:58)")
    p.add_argument("--show", action="store_true",
                   help="display rendered detections in a window "
                        "(reference tools/test.py:62 --show; needs a "
                        "display — headless environments should use "
                        "--show-dir)")
    p.add_argument("--show-dir", default=None,
                   help="render detections onto the source images here "
                        "(reference tools/test.py:51-56 --show-dir)")
    p.add_argument("--show-score-thr", type=float, default=0.3,
                   help="score threshold for --show/--show-dir rendering")
    p.add_argument("--show-wait", type=int, default=0,
                   help="--show per-image wait in ms (0 = until keypress)")
    p.add_argument("--dtype", default="auto",
                   choices=["auto", "f32", "bf16"],
                   help="model compute dtype: 'auto' follows the "
                        "config's act_dtype (float32 parity default); "
                        "'bf16' is the TPU deployment mode (~3x faster "
                        "at the flagship bucket)")
    p.add_argument("--compile-cache", default=None,
                   help="persistent XLA compilation cache dir "
                        "('off' disables; default ~/.cache/pavenet_tpu)")
    p.add_argument("--cfg-options", nargs="+", default=[])
    return p.parse_args()


def show_results(dataset, detections, show_dir, score_thr, logger,
                 show=False, wait=0):
    """Render per-image detections (``--show-dir`` / on-screen ``--show``)."""
    from pavenet_tpu.utils.visualize import render_detections
    if show_dir:
        os.makedirs(show_dir, exist_ok=True)
    if show and not os.environ.get("DISPLAY"):
        logger.warning("--show: no DISPLAY available (headless) — "
                       "skipping the on-screen window; use --show-dir")
        show = False
    by_img = {}
    for d in detections:
        by_img.setdefault(d["image_id"], []).append(d)
    infos = {info["id"]: info for info in dataset.data_infos}
    class_names = getattr(dataset, "CLASSES", None)
    n = 0
    for img_id, dets in by_img.items():
        info = infos.get(img_id)
        if info is None:
            continue
        src = os.path.join(dataset.img_prefix, info["file_name"])
        out_file = (os.path.join(show_dir,
                                 os.path.basename(info["file_name"]))
                    if show_dir else None)
        try:
            rendered = render_detections(
                src, dets, score_thr=score_thr, out_file=out_file,
                class_names=class_names)
            n += 1
        except FileNotFoundError:
            logger.warning(f"show: missing source image {src}")
            continue
        if show:
            import cv2
            cv2.imshow("pavenet", rendered)
            if cv2.waitKey(wait) & 0xFF in (27, ord("q")):
                show = False
                cv2.destroyAllWindows()
    if show:
        import cv2
        cv2.destroyAllWindows()
    if show_dir:
        logger.info(f"rendered {n} images to {show_dir}")


def main():
    args = parse_args()
    from pavenet_tpu import Config, DictAction
    from pavenet_tpu.utils import get_root_logger, enable_compilation_cache
    from pavenet_tpu.models.builder import build_detector, resolve_act_dtype
    from pavenet_tpu.models.detectors.soit import SOITDetector
    from pavenet_tpu.models.detectors.inspose import InsPoseDetector
    from pavenet_tpu.registry import DATASETS
    from pavenet_tpu.datasets.loader import ClipLoader
    from pavenet_tpu.datasets.pipelines import build_test_pipeline
    from pavenet_tpu.apis.test import (
        run_inference, run_det_inference, evaluate_dataset,
        gather_detections)
    from pavenet_tpu.parallel.mesh import maybe_init_distributed
    from pavenet_tpu.utils.checkpoint import restore_variables

    import jax
    import numpy as np

    cfg = Config.fromfile(args.config)
    from pavenet_tpu.config import replace_cfg_vals, update_data_root
    cfg = replace_cfg_vals(cfg)
    update_data_root(cfg)
    if args.cfg_options:
        cfg.merge_from_dict(DictAction.parse(args.cfg_options))
    logger = get_root_logger()
    enable_compilation_cache(args.compile_cache, cfg, logger)
    maybe_init_distributed(logger)

    act_dtype = resolve_act_dtype(cfg, args.dtype)
    logger.info(f"model compute dtype: {act_dtype.__name__}")
    model = build_detector(cfg.model, dtype=act_dtype)
    is_det = isinstance(model, (SOITDetector, InsPoseDetector))
    test_cfg = dict(cfg.data["test"])
    test_cfg.pop("pipeline", None)
    pipe_kwargs = dict(cfg.get("test_pipeline_kwargs", {}))
    if not is_det:
        # uint8 images over the wire + (x-mean)/std inside the inference
        # jit: 4x less host->device payload (the dominant eval cost on a
        # tunneled chip) and no host normalize pass.  Config can override
        # with test_pipeline_kwargs normalize_on_device=False.
        pipe_kwargs.setdefault("normalize_on_device", True)
    img_norm = (pipe_kwargs.get("img_norm_mean", (123.675, 116.28, 103.53)),
                pipe_kwargs.get("img_norm_std", (58.395, 57.12, 57.375)))
    dataset = DATASETS.build(
        dict(**test_cfg, pipeline=build_test_pipeline(**pipe_kwargs)))
    # single process with several local chips: shard the clip axis over a
    # device mesh (inference DP; the reference instead launched one process
    # per GPU).  Multi-process runs keep sharding the dataset per process.
    mesh = None
    if jax.process_count() == 1 and len(jax.devices()) > 1:
        from pavenet_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
        logger.info(f"inference DP over {len(jax.devices())} devices")
    batch_size = len(jax.devices()) if mesh is not None else 1
    loader = ClipLoader(dataset, batch_size=batch_size, shuffle=False,
                        drop_last=False,
                        num_keypoints=dataset.NUM_KEYPOINTS,
                        num_shards=jax.process_count(),
                        shard_index=jax.process_index())

    if is_det:
        # detection / instance-seg family: the checkpoint tree is
        # self-describing (no skeleton needed); single-frame inputs
        variables = restore_variables(os.path.abspath(args.checkpoint))
        text_feats = None
        tf_path = cfg.model.get("text_encoder", {}).get("text_feat_path")
        if tf_path:  # DK-DETR classifies against text embeddings
            text_feats = np.load(tf_path).astype(np.float32)
            logger.info(f"text embeddings: {tf_path} {text_feats.shape}")

        def det_batches():
            for b in loader:
                b = dict(b)
                b["img"] = b["img"][:, 0]  # (B, T=1, H, W, 3) -> (B, ...)
                if text_feats is not None:
                    b["text_feats"] = text_feats
                yield b

        det_score_thr = (cfg.model.get("test_cfg") or {}).get(
            "score_thr", 0.05)
        detections = gather_detections(run_det_inference(
            model, variables, det_batches(), score_thr=det_score_thr,
            logger=logger, mesh=mesh))
        # binary masks -> RLE-free polygon-less payload is not
        # json-serializable; keep masks only for eval/show, strip for --out
        dump = [{k: v for k, v in d.items() if k != "segmentation"}
                for d in detections] if args.out else None
    else:
        # template-free {params, batch_stats} restore — building a train
        # state skeleton here would cost a full extra init compile
        variables = restore_variables(os.path.abspath(args.checkpoint))
        detections = gather_detections(
            run_inference(model, variables, loader, logger=logger,
                          flip_test=args.flip_test,
                          aug_scales=args.aug_scales, mesh=mesh,
                          img_norm=img_norm))
        dump = detections
    if jax.process_index() != 0:
        return
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dump, f)
        logger.info(f"wrote {len(detections)} detections to {args.out}")
    if args.show_dir or args.show:
        show_results(dataset, detections, args.show_dir,
                     args.show_score_thr, logger,
                     show=args.show, wait=args.show_wait)
    if args.format_only:
        return
    results = evaluate_dataset(dataset, detections)
    for k, v in results.items():
        logger.info(f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}")


if __name__ == "__main__":
    main()
