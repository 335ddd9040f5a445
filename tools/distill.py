#!/usr/bin/env python
"""Distill a windowed-encoder student from a parity-encoder teacher.

Usage:
    python tools/distill.py <windowed_config.py> <teacher_ckpt> \
        [--work-dir D] [--steps N] [--lr LR] [--cfg-options k=v ...]

The config is a windowed-encoder config (e.g.
``configs/videopose/pavenet_r50_frames3_posetrack17_windowed.py``); the
teacher is a checkpoint of the SAME architecture with the parity
(deformable) encoder — typically trained with tools/train.py or
converted from a reference .pth via tools/dataset_converters/
torch2flax.py.  The student copies every non-encoder parameter from the
teacher and trains only ``head/encoder_layer*`` to match the teacher's
encoder memory on the config's train data (see
``pavenet_tpu/apis/distill.py``).  The resulting checkpoint evaluates
with the standard ``tools/test.py <windowed_config> <ckpt>``.

No reference counterpart (the reference retrains encoder variants on
real data); this is the TPU-native accuracy-transfer path for the
windowed encoder, measured in PERF_NOTES / BASELINE.md.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax
    jax.config.update("jax_platforms", "cpu")


def parse_args():
    p = argparse.ArgumentParser(description="Distill windowed encoder")
    p.add_argument("config", help="windowed-encoder config")
    p.add_argument("teacher_checkpoint")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-interval", type=int, default=20)
    p.add_argument("--prebaked", default=None,
                   help="directory of batches baked by tools/bake_batches.py"
                        " (reuse the teacher's baked batches; zero host "
                        "aug cost per step)")
    p.add_argument("--dtype", default="auto",
                   choices=["auto", "f32", "bf16"],
                   help="student/teacher compute dtype ('auto' follows "
                        "the config's act_dtype)")
    p.add_argument("--compile-cache", default=None)
    p.add_argument("--cfg-options", nargs="+", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    import copy

    from pavenet_tpu import Config, DictAction
    from pavenet_tpu.config import replace_cfg_vals, update_data_root
    from pavenet_tpu.utils import (get_root_logger, set_random_seed,
                                   enable_compilation_cache)

    cfg = Config.fromfile(args.config)
    cfg = replace_cfg_vals(cfg)
    update_data_root(cfg)
    if args.cfg_options:
        cfg.merge_from_dict(DictAction.parse(args.cfg_options))
    enc_mode = (cfg.model.get("bbox_head", {}).get("transformer", {})
                .get("encoder", {}).get("mode", "deformable"))
    if enc_mode != "windowed":
        raise SystemExit("config must set model.bbox_head.transformer."
                         "encoder.mode='windowed' (the student); got "
                         f"{enc_mode!r}")
    work_dir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0]
        + "_distill")
    os.makedirs(work_dir, exist_ok=True)
    logger = get_root_logger(os.path.join(
        work_dir, f"{time.strftime('%Y%m%d_%H%M%S')}.log"))
    set_random_seed(args.seed)
    enable_compilation_cache(args.compile_cache, cfg, logger)

    import jax
    from pavenet_tpu.models.builder import build_detector, resolve_act_dtype
    from pavenet_tpu.apis.distill import (create_distill_state,
                                          make_distill_step)
    from pavenet_tpu.parallel.mesh import make_mesh, put_batch
    from pavenet_tpu.registry import DATASETS
    from pavenet_tpu.datasets.loader import ClipLoader
    from pavenet_tpu.datasets.pipelines import build_train_pipeline
    from pavenet_tpu.utils.checkpoint import (save_checkpoint,
                                              restore_variables)

    logger.info(f"devices: {jax.devices()}")
    act_dtype = resolve_act_dtype(cfg, args.dtype)
    logger.info(f"model compute dtype: {act_dtype.__name__}")
    student = build_detector(cfg.model, dtype=act_dtype)
    teacher_model_cfg = copy.deepcopy(dict(cfg.model))
    teacher_model_cfg["bbox_head"]["transformer"]["encoder"]["mode"] = \
        "deformable"
    teacher = build_detector(teacher_model_cfg, dtype=act_dtype)
    mesh = make_mesh()

    data_cfg = cfg.get("data", {})
    if args.prebaked:
        from pavenet_tpu.datasets.loader import PrebakedLoader
        loader = PrebakedLoader(args.prebaked, seed=args.seed)
        logger.info(f"prebaked batches: {len(loader)}/epoch x "
                    f"{len(loader.variants)} variants from {args.prebaked}")
    else:
        batch_size = data_cfg.get("samples_per_gpu", 1) * \
            jax.local_device_count()
        train_cfg = dict(data_cfg["train"])
        train_cfg.pop("pipeline", None)
        pipe_kwargs = dict(cfg.get("train_pipeline_kwargs", {}))
        dataset = DATASETS.build(
            dict(**train_cfg, pipeline=build_train_pipeline(**pipe_kwargs)))
        loader = ClipLoader(dataset, batch_size=batch_size,
                            max_gt=cfg.get("max_gt", 30),
                            num_keypoints=dataset.NUM_KEYPOINTS,
                            seed=args.seed,
                            num_shards=jax.process_count(),
                            shard_index=jax.process_index())

    first = next(iter(loader))
    # Distillation needs only the teacher's {params, batch_stats} — restore
    # them template-free.  A full TrainState restore would need the exact
    # optimizer the teacher was trained with (its opt_state tree depends on
    # cumulative_iters etc.) and rejects any mismatch, which is both fragile
    # and unnecessary here.
    teacher_vars = restore_variables(args.teacher_checkpoint)
    # stage the teacher on device ONCE — a restored numpy tree passed as
    # a per-step jit argument re-transfers every step (~166 MB for the
    # flagship; PERF_NOTES "Round 5: eval CLI decomposition")
    from pavenet_tpu.parallel.mesh import replicate
    teacher_vars = jax.device_put(
        teacher_vars, replicate(mesh) if mesh is not None else None)
    logger.info(f"teacher restored from {args.teacher_checkpoint} "
                "(params + batch_stats only)")

    tp_kwargs = dict(cfg.get("train_pipeline_kwargs", {}))
    img_norm = (tp_kwargs.get("img_norm_mean", (123.675, 116.28, 103.53)),
                tp_kwargs.get("img_norm_std", (58.395, 57.12, 57.375)))
    state, tx = create_distill_state(student, teacher_vars["params"], first,
                                     seed=args.seed,
                                     learning_rate=args.lr,
                                     img_norm=img_norm)
    step = make_distill_step(student, teacher, tx, mesh=mesh,
                             img_norm=img_norm)

    total = 0
    t_iter = time.time()
    while total < args.steps:
        for batch in loader:
            batch = put_batch(batch, mesh)
            state, logs = step(state, teacher_vars, batch)
            total += 1
            if total % args.log_interval == 0 or total == 1:
                dt, t_iter = time.time() - t_iter, time.time()
                logger.info(
                    f"step {total}/{args.steps} "
                    f"mse: {float(logs['distill_mse']):.6f} "
                    f"rel: {float(logs['distill_rel']):.6f} "
                    f"({dt / min(args.log_interval, total):.3f} s/it)")
            if total >= args.steps:
                break
    save_checkpoint(work_dir, state, int(state.step),
                    meta=dict(distilled_from=args.teacher_checkpoint))
    logger.info(f"student checkpoint saved under {work_dir}; evaluate "
                f"with: python tools/test.py {args.config} "
                f"{work_dir}/step_{int(state.step)} --eval keypoints")


if __name__ == "__main__":
    main()
