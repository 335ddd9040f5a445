#!/usr/bin/env python
"""Evaluate a checkpoint on a dataset (reference surface: ``tools/test.py``).

Usage:
    python tools/test.py <config.py> <checkpoint> [--eval keypoints]
        [--out results.json] [--cfg-options k=v ...]
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
    p = argparse.ArgumentParser(description="Test a pose model")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--eval", default="keypoints")
    p.add_argument("--flip-test", action="store_true",
                   help="test-time horizontal-flip merge (reference "
                        "aug_test, videoposev1.py:224)")
    p.add_argument("--out", default=None,
                   help="dump detections json")
    p.add_argument("--cfg-options", nargs="+", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    from pavenet_tpu import Config, DictAction
    from pavenet_tpu.utils import get_root_logger
    from pavenet_tpu.models.builder import build_detector
    from pavenet_tpu.registry import DATASETS
    from pavenet_tpu.datasets.loader import ClipLoader
    from pavenet_tpu.datasets.pipelines import build_test_pipeline
    from pavenet_tpu.apis.test import (
        run_inference, evaluate_dataset, gather_detections)
    from pavenet_tpu.apis.train import create_train_state
    from pavenet_tpu.parallel.mesh import maybe_init_distributed
    from pavenet_tpu.utils.checkpoint import restore_variables
    from pavenet_tpu.models.zoo import dummy_clip_batch

    import jax
    import numpy as np

    cfg = Config.fromfile(args.config)
    from pavenet_tpu.config import replace_cfg_vals, update_data_root
    cfg = replace_cfg_vals(cfg)
    update_data_root(cfg)
    if args.cfg_options:
        cfg.merge_from_dict(DictAction.parse(args.cfg_options))
    logger = get_root_logger()
    maybe_init_distributed(logger)

    model = build_detector(cfg.model)
    test_cfg = dict(cfg.data["test"])
    test_cfg.pop("pipeline", None)
    pipe_kwargs = dict(cfg.get("test_pipeline_kwargs", {}))
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

    # initialize a state skeleton, then restore the checkpoint into it
    rng = np.random.RandomState(0)
    dummy = dummy_clip_batch(
        rng, num_frames=model.num_frames, height=256, width=448,
        num_keypoints=model.num_keypoints,
        max_gt=min(model.max_gt, model.num_query), train=True)
    state, _ = create_train_state(model, dummy, seed=0)
    variables = restore_variables(
        os.path.abspath(args.checkpoint), state.params, state.batch_stats)

    detections = gather_detections(
        run_inference(model, variables, loader, logger=logger,
                      flip_test=args.flip_test, mesh=mesh))
    if jax.process_index() != 0:
        return
    if args.out:
        with open(args.out, "w") as f:
            json.dump(detections, f)
        logger.info(f"wrote {len(detections)} detections to {args.out}")
    results = evaluate_dataset(dataset, detections)
    for k, v in results.items():
        logger.info(f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}")


if __name__ == "__main__":
    main()
