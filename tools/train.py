#!/usr/bin/env python
"""Train a model from a config file (reference surface: ``tools/train.py``).

Usage:
    python tools/train.py <config.py> [--work-dir D] [--resume-from CKPT]
        [--auto-resume] [--seed N] [--cfg-options k=v ...] [--synthetic]

Differences from the reference CLI are TPU-native: no --launcher (multi-host
comes from ``jax.distributed.initialize``), and ``--synthetic`` trains on
generated data for smoke runs without a dataset on disk.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    # some environments pre-register an accelerator plugin that wins over
    # the env var; re-assert the user's choice
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train a pose model")
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--auto-resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-steps", type=int, default=None,
                   help="cap total steps (smoke runs)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic data (no dataset required)")
    p.add_argument("--prebaked", default=None,
                   help="directory of batches baked by tools/bake_batches.py"
                        " — replaces the live dataset+pipeline loader "
                        "(1-vCPU hosts: host augs otherwise throttle the "
                        "chip)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of steps 2-4 here")
    p.add_argument("--no-validate", action="store_true",
                   help="skip per-epoch evaluation on data.val")
    p.add_argument("--compile-cache", default=None,
                   help="persistent XLA compilation cache dir "
                        "('off' disables; default ~/.cache/pavenet_tpu)")
    p.add_argument("--rss-limit-gb", type=float, default=96.0,
                   help="checkpoint + exit(3) when host RSS exceeds this "
                        "(the tunneled-TPU client leaks every transferred "
                        "batch's host copy — ~batch bytes/step, PERF_NOTES "
                        "round 5; relaunch with --auto-resume, or loop "
                        "tools/perf/train_segments.sh).  0 disables")
    p.add_argument("--dtype", default="auto",
                   choices=["auto", "f32", "bf16"],
                   help="model compute dtype ('auto' follows the "
                        "config's act_dtype; params/optimizer stay f32)")
    p.add_argument("--cfg-options", nargs="+", default=[])
    return p.parse_args()


def _rss_gb() -> float:
    import psutil
    return psutil.Process().memory_info().rss / 1e9


def synthetic_loader(model_cfg, batch_size, steps, seed=0):
    from pavenet_tpu.models.zoo import dummy_clip_batch
    rng = np.random.RandomState(seed)
    for _ in range(steps):
        yield dummy_clip_batch(
            rng, batch_size=batch_size,
            num_frames=model_cfg.get("num_frames", 3),
            height=256, width=448,
            num_keypoints=model_cfg.get("num_keypoints", 15),
            max_gt=10, train=True)


def main():
    args = parse_args()
    from pavenet_tpu import Config, DictAction
    from pavenet_tpu.utils import get_root_logger, LogBuffer, set_random_seed

    cfg = Config.fromfile(args.config)
    from pavenet_tpu.config import replace_cfg_vals, update_data_root
    cfg = replace_cfg_vals(cfg)
    update_data_root(cfg)
    if args.cfg_options:
        cfg.merge_from_dict(DictAction.parse(args.cfg_options))
    work_dir = args.work_dir or cfg.get("work_dir") or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    logger = get_root_logger(
        os.path.join(work_dir, f"{time.strftime('%Y%m%d_%H%M%S')}.log"))
    set_random_seed(args.seed)
    from pavenet_tpu.utils import enable_compilation_cache
    enable_compilation_cache(args.compile_cache, cfg, logger)

    import jax
    from pavenet_tpu.models.builder import build_detector, resolve_act_dtype
    from pavenet_tpu.apis.train import (
        build_optimizer, create_train_state, make_train_step,
        build_lr_schedule)
    from pavenet_tpu.parallel.mesh import (
        make_mesh, put_batch, maybe_init_distributed)
    from pavenet_tpu.utils.checkpoint import (
        save_checkpoint, restore_checkpoint, find_latest_checkpoint)

    maybe_init_distributed(logger)
    logger.info(f"devices: {jax.devices()}")
    act_dtype = resolve_act_dtype(cfg, args.dtype)
    logger.info(f"model compute dtype: {act_dtype.__name__}")
    model = build_detector(cfg.model, dtype=act_dtype)
    mesh = make_mesh()
    n_dev = jax.local_device_count()  # per-process batch slice

    data_cfg = cfg.get("data", {})
    samples_per_gpu = data_cfg.get("samples_per_gpu", 1)
    batch_size = samples_per_gpu * n_dev
    max_epochs = cfg.get("runner", {}).get("max_epochs", 20)

    if args.synthetic:
        steps_per_epoch = 20
        def epoch_loader(epoch):
            return synthetic_loader(cfg.model.get("bbox_head", {}),
                                    batch_size, steps_per_epoch,
                                    seed=args.seed + epoch)
        head_cfg = cfg.model.get("bbox_head", {})
        max_gt, num_k = 10, head_cfg.get("num_keypoints", 15)
    elif args.prebaked:
        from pavenet_tpu.datasets.loader import PrebakedLoader
        loader = PrebakedLoader(args.prebaked, seed=args.seed)
        steps_per_epoch = len(loader)
        logger.info(f"prebaked batches: {steps_per_epoch}/epoch x "
                    f"{len(loader.variants)} variants from {args.prebaked}")
        def epoch_loader(epoch):
            return loader
    else:
        from pavenet_tpu.registry import DATASETS
        from pavenet_tpu.datasets.loader import ClipLoader
        from pavenet_tpu.datasets.pipelines import build_train_pipeline
        train_cfg = dict(data_cfg["train"])
        train_cfg.pop("pipeline", None)
        pipe_kwargs = dict(cfg.get("train_pipeline_kwargs", {}))
        dataset = DATASETS.build(
            dict(**train_cfg, pipeline=build_train_pipeline(**pipe_kwargs)))
        max_gt = cfg.get("max_gt", 30)
        num_k = dataset.NUM_KEYPOINTS
        loader = ClipLoader(dataset, batch_size=batch_size, max_gt=max_gt,
                            num_keypoints=num_k, seed=args.seed,
                            num_shards=jax.process_count(),
                            shard_index=jax.process_index())
        steps_per_epoch = len(loader)
        def epoch_loader(epoch):
            return loader

    opt_cfg = cfg.get("optimizer", {})
    accum = cfg.get("optimizer_config", {}).get("cumulative_iters", 8)
    clip = cfg.get("optimizer_config", {}).get("grad_clip", {}).get(
        "max_norm", 0.1)
    base_lr = opt_cfg.get("lr", 2e-5)
    # linear-scaling-rule auto LR (reference ``opera/apis/train.py:72``):
    # cfg.auto_scale_lr = dict(enable=True, base_batch_size=N) scales lr
    # by (global batch / base_batch_size)
    asl = cfg.get("auto_scale_lr", {}) or {}
    if asl.get("enable", False) and asl.get("base_batch_size"):
        global_batch = samples_per_gpu * jax.device_count()
        if global_batch != asl["base_batch_size"]:
            scaled = base_lr * global_batch / asl["base_batch_size"]
            logger.info(f"auto_scale_lr: global batch {global_batch} vs "
                        f"base {asl['base_batch_size']} -> lr "
                        f"{base_lr} -> {scaled}")
            base_lr = scaled
    schedule = build_lr_schedule(
        cfg.get("lr_config", {}) or {}, base_lr,
        steps_per_epoch, max_epochs=max_epochs)

    ema_decay = 0.0
    for hook in cfg.get("custom_hooks", []):
        if hook.get("type", "").endswith("EMAHook"):
            ema_decay = 1.0 - hook.get("momentum", 0.0002)

    first = next(iter(epoch_loader(0)))
    # dropout-mask PRNG: 'rbg' (hardware bit generator) by default —
    # ~35 ms/step faster than threefry on the flagship (PERF_NOTES
    # "Round 4: training backward anatomy"); set prng_impl='threefry2x32'
    # in the config for a backend-portable bit stream
    prng_impl = cfg.get("prng_impl", "rbg")
    # paramwise_cfg lr multipliers + freezing semantics from the config
    # (reference ``opera/apis/train.py`` optimizer build); from-scratch
    # recipes override backbone lr_mult to 1.0 and frozen_stages to -1
    custom = (opt_cfg.get("paramwise_cfg", {}) or {}).get("custom_keys", {})
    # uint8 train feed (normalize_on_device pipelines / prebaked bakes):
    # (x-mean)/std runs inside the train jit (apis/prep.py)
    tp_kwargs = dict(cfg.get("train_pipeline_kwargs", {}))
    img_norm = (tp_kwargs.get("img_norm_mean", (123.675, 116.28, 103.53)),
                tp_kwargs.get("img_norm_std", (58.395, 57.12, 57.375)))
    state, tx = create_train_state(
        model, first, seed=args.seed, ema_decay=ema_decay,
        prng_impl=prng_impl, img_norm=img_norm,
        tx_kwargs=dict(learning_rate=schedule,
                       weight_decay=opt_cfg.get("weight_decay", 1e-4),
                       grad_clip=clip, accumulate_steps=accum,
                       backbone_lr_mult=custom.get(
                           "backbone", {}).get("lr_mult", 0.1),
                       offsets_lr_mult=custom.get(
                           "sampling_offsets", {}).get("lr_mult", 0.1),
                       frozen_stages=getattr(model, "frozen_stages", 1),
                       trainable_bn=not getattr(model, "norm_eval", True),
                       freeze_backbone_neck=getattr(
                           model, "freeze_backbone_neck", False)))
    train_step = make_train_step(model, tx, mesh=mesh, ema_decay=ema_decay,
                                 prng_impl=prng_impl, img_norm=img_norm)

    start_epoch = 0
    resume = args.resume_from or (
        find_latest_checkpoint(work_dir) if args.auto_resume else None)
    if resume:
        logger.info(f"resuming from {resume}")
        state = restore_checkpoint(resume, state)
        start_epoch = int(state.step) // max(steps_per_epoch, 1)

    from pavenet_tpu.utils import MetricSinks
    buf = LogBuffer()
    sinks = MetricSinks(work_dir) if jax.process_index() == 0 else None
    total = 0
    log_interval = cfg.get("log_config", {}).get("interval", 40)
    for epoch in range(start_epoch, max_epochs):
        it = iter(epoch_loader(epoch))
        i = -1
        t_iter = time.time()
        while True:
            # mmcv IterTimerHook semantics: data_time = host wait on the
            # loader, time = full iteration wall clock (dispatch-async,
            # like the reference's non-synchronized CUDA timings)
            t0 = time.time()
            try:
                batch = next(it)
            except StopIteration:
                break
            i += 1
            data_time = time.time() - t0
            batch = put_batch(batch, mesh)
            if args.profile_dir and total == 2:
                jax.profiler.start_trace(args.profile_dir)
            state, losses = train_step(state, batch)
            total += 1
            if args.profile_dir and total == 4:
                jax.tree_util.tree_leaves(losses)[0].block_until_ready()
                jax.profiler.stop_trace()
            iter_time, t_iter = time.time() - t_iter, time.time()
            if total % log_interval == 0 or i == 0:
                vals = {k: float(v) for k, v in losses.items()}
                vals["time"] = iter_time
                vals["data_time"] = data_time
                buf.update(vals)
                buf.average(1)
                if sinks is not None:
                    sinks.log(total, vals)
                msg = " ".join(f"{k}: {v:.4f}"
                               for k, v in sorted(buf.output.items()))
                logger.info(f"epoch {epoch + 1}/{max_epochs} "
                            f"step {total}: {msg}")
            if args.max_steps and total >= args.max_steps:
                break
            # host-RSS guard: the axon tunnel client never frees the host
            # copy of transferred arrays (leak == payload bytes per step,
            # measured: 4760 steps x 24.8 MB -> 118 GB -> OOM kill).
            # Checkpoint + exit(3) well before the OOM killer fires; a
            # relaunch with --auto-resume restarts this epoch.
            if (args.rss_limit_gb and total % 100 == 0
                    and _rss_gb() > args.rss_limit_gb):
                save_checkpoint(work_dir, state, int(state.step),
                                meta=dict(epoch=epoch))
                logger.warning(
                    f"host RSS {_rss_gb():.1f} GB > {args.rss_limit_gb} "
                    f"GB limit: checkpointed step {int(state.step)}; "
                    "exiting 3 for relaunch with --auto-resume "
                    "(tunnel-client transfer leak, PERF_NOTES round 5)")
                sys.exit(3)
        # mmcv CheckpointHook(interval=N): save every N epochs + always on
        # exit (production configs use interval=1)
        ckpt_cfg = cfg.get("checkpoint_config", {}) or {}
        ckpt_interval = ckpt_cfg.get("interval", 1)
        last = ((epoch + 1 == max_epochs)
                or (args.max_steps and total >= args.max_steps))
        if (epoch + 1) % ckpt_interval == 0 or last:
            save_checkpoint(
                work_dir, state, int(state.step),
                meta=dict(epoch=epoch + 1),
                max_keep=ckpt_cfg.get("max_keep_ckpts", 20))
        # per-epoch EvalHook (reference opera/core/evaluation/eval_hooks.py)
        eval_interval = cfg.get("evaluation", {}).get("interval", 1)
        if (not args.no_validate and not args.synthetic
                and "val" in data_cfg
                and (epoch + 1) % eval_interval == 0):
            try:
                from pavenet_tpu.registry import DATASETS
                from pavenet_tpu.datasets.loader import ClipLoader
                from pavenet_tpu.datasets.pipelines import (
                    build_test_pipeline)
                from pavenet_tpu.apis.test import (
                    run_inference, evaluate_dataset, gather_detections)
                val_cfg = dict(data_cfg["val"])
                val_cfg.pop("pipeline", None)
                val_cfg.pop("samples_per_gpu", None)
                pipe_kwargs = dict(cfg.get("test_pipeline_kwargs", {}))
                # uint8 over the wire + in-jit normalize (see tools/test.py)
                pipe_kwargs.setdefault("normalize_on_device", True)
                img_norm = (
                    pipe_kwargs.get("img_norm_mean",
                                    (123.675, 116.28, 103.53)),
                    pipe_kwargs.get("img_norm_std",
                                    (58.395, 57.12, 57.375)))
                val_ds = DATASETS.build(dict(
                    **val_cfg, pipeline=build_test_pipeline(**pipe_kwargs)))
                val_loader = ClipLoader(
                    val_ds, batch_size=1, shuffle=False, drop_last=False,
                    num_keypoints=val_ds.NUM_KEYPOINTS,
                    num_shards=jax.process_count(),
                    shard_index=jax.process_index())
                variables = {"params": state.params,
                             "batch_stats": state.batch_stats}
                dets = gather_detections(run_inference(
                    model, variables, val_loader, logger=logger,
                    img_norm=img_norm))
                if jax.process_index() == 0:
                    for k, v in evaluate_dataset(val_ds, dets).items():
                        if isinstance(v, float):
                            logger.info(
                                f"val epoch {epoch + 1} {k}: {v:.4f}")
            except Exception as e:  # eval must not kill training
                logger.warning(f"eval hook failed: {e}")
        if args.max_steps and total >= args.max_steps:
            break
    logger.info("training done")


if __name__ == "__main__":
    main()
