"""Training harness: optimizer groups, grad accumulation, sharded step.

Rebuilds the reference train stack — ``opera/apis/train.py:118-249``
(optimizer build with ``paramwise_cfg`` lr multipliers),
``GradientCumulativeOptimizerHook`` (``third_party/mmcv/mmcv/runner/hooks/
optimizer.py:97``: accumulate 8 iters, clip global norm 0.1, AdamW step) and
the step lr policy — as an optax chain inside one jitted, mesh-sharded train
step.

Production parameter groups
(``configs/videopose/2025-2-13/...posetrack17.py:139-149``):
    backbone.*            lr_mult 0.1 (stem+stage1 and all BN frozen)
    *sampling_offsets*    lr_mult 0.1
    *reference_points*    lr_mult 0.1 (not present in the two-stage model)
    everything else       lr_mult 1.0
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    ema_params: Any = None  # optional EMA of params (mmcv EMAHook)


def _param_label(path: tuple, freeze_backbone_neck: bool = False,
                 trainable_bn: bool = False,
                 frozen_stages: int = 1) -> str:
    keys = [getattr(k, "key", str(k)) for k in path]
    joined = "/".join(keys)
    if freeze_backbone_neck and ("backbone" in keys or "neck" in keys):
        # VideoPoseV2: backbone + neck excluded from training entirely
        # (reference runs them under no_grad, ``videoposev2.py:56-60``)
        return "frozen"
    if "backbone" in keys:
        # frozen pieces: stem + stages <= frozen_stages (mmdet
        # ``_freeze_stages``; every reference config uses 1, built for
        # ImageNet-pretrained weights).  frozen_stages=-1 freezes nothing
        # — required for from-scratch recipes, where a frozen random stem
        # destroys the feature extractor (the round-4 AP~0 teacher).
        # Only the backbone's *direct child* decides — every block has an
        # inner module named bn1/conv1 that must not match.
        child = keys[keys.index("backbone") + 1]
        if frozen_stages >= 0 and child.startswith(("conv1", "bn1")):
            return "frozen"
        if any(child.startswith(f"layer{s}_")
               for s in range(1, frozen_stages + 1)):
            return "frozen"
        if "/bn" in joined or "downsample_bn" in joined:
            # frozen-BN configs freeze the affines; trainable-BN (DK-DETR
            # SyncBN requires_grad=True) trains them at backbone lr with
            # norm_decay_mult=0 (``dkd_r50_70e_lvis.py:179``)
            return "backbone_norm" if trainable_bn else "frozen"
        return "backbone"
    if "sampling_offsets" in keys or "reference_points" in keys:
        return "slow"
    return "base"


def step_lr_schedule(base_lr: float, steps_per_epoch: int,
                     decay_epochs=(10,), gamma: float = 0.1):
    """mmcv StepLrUpdater: multiply by gamma at each decay epoch."""
    boundaries = {int(e * steps_per_epoch): gamma for e in decay_epochs}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def build_lr_schedule(lr_config: dict, base_lr: float,
                      steps_per_epoch: int, max_epochs: int = 20):
    """mmcv ``lr_config`` -> optax schedule.

    Policies (``third_party/mmcv/mmcv/runner/hooks/lr_updater.py``):
    'step' (gamma decay at epochs; every reference config) and 'cosine'
    (CosineAnnealingLrUpdaterHook, ``min_lr``/``min_lr_ratio``).  Warmup:
    'linear' (factor ``1 - (1-k/N)(1-ratio)``), 'constant', 'exp' over
    ``warmup_iters`` steps, exactly mmcv's factor formulas.
    """
    policy = lr_config.get("policy", "step")
    if policy == "step":
        gamma = lr_config.get("gamma", 0.1)
        step = lr_config.get("step", [10])
        if isinstance(step, int):
            step = [step]
        main = step_lr_schedule(base_lr, steps_per_epoch, step, gamma)
    elif policy in ("cosine", "CosineAnnealing"):
        min_lr = lr_config.get("min_lr")
        if min_lr is None:
            min_lr = base_lr * lr_config.get("min_lr_ratio", 0.0)
        total = max(steps_per_epoch * max_epochs, 1)

        def main(t):
            frac = jnp.clip(t / total, 0.0, 1.0)
            cos = 0.5 * (jnp.cos(jnp.pi * frac) + 1.0)
            return min_lr + (base_lr - min_lr) * cos
    else:
        raise KeyError(f"unsupported lr policy {policy!r}")

    warmup = lr_config.get("warmup")
    if not warmup:
        return main
    n = lr_config.get("warmup_iters", 500)
    ratio = lr_config.get("warmup_ratio", 0.1)

    def schedule(t):
        k = jnp.minimum(t, n).astype(jnp.float32)
        if warmup == "linear":
            factor = 1.0 - (1.0 - k / n) * (1.0 - ratio)
        elif warmup == "constant":
            factor = jnp.asarray(ratio, jnp.float32)
        elif warmup == "exp":
            factor = ratio ** (1.0 - k / n)
        else:
            raise KeyError(f"unsupported warmup {warmup!r}")
        warm = main(t) * factor
        return jnp.where(t < n, warm, main(t))

    return schedule


def build_optimizer(params,
                    learning_rate: Callable | float = 2e-5,
                    weight_decay: float = 1e-4,
                    grad_clip: float = 0.1,
                    accumulate_steps: int = 8,
                    backbone_lr_mult: float = 0.1,
                    offsets_lr_mult: float = 0.1,
                    freeze_backbone_neck: bool = False,
                    trainable_bn: bool = False,
                    frozen_stages: int = 1):
    """AdamW with per-group lr multipliers + clip + accumulation."""
    def adamw(mult, wd=weight_decay):
        if callable(learning_rate):
            lr = lambda t: learning_rate(t) * mult
        else:
            lr = learning_rate * mult
        return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=wd)

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: _param_label(path, freeze_backbone_neck,
                                     trainable_bn, frozen_stages), params)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.multi_transform(
            {"base": adamw(1.0),
             "backbone": adamw(backbone_lr_mult),
             "backbone_norm": adamw(backbone_lr_mult, wd=0.0),
             "slow": adamw(offsets_lr_mult),
             "frozen": optax.set_to_zero()},
            labels),
    )
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


_THREEFRY = (None, "threefry", "threefry2x32")


def create_train_state(model, batch, seed: int = 0, tx=None,
                       tx_kwargs: Optional[Dict] = None,
                       ema_decay: float = 0.0,
                       prng_impl: Optional[str] = None,
                       img_norm=None) -> TrainState:
    """Initialize params (jitted — eager init is pathologically slow over
    remote device tunnels) and the optimizer state.

    ``prng_impl``: PRNG implementation for the training rng stream
    (dropout masks).  ``'rbg'`` uses the hardware bit generator for mask
    bits (threefry for splits) — measured 925 -> 892 ms/step on the
    flagship at 800x1344 bf16 (PERF_NOTES "Round 4: training backward
    anatomy"); still deterministic per seed, but the bit stream is
    backend/compiler-version specific, unlike threefry.  ``state.rng``
    stores the raw key data (plain uint32 array) so checkpoints never
    carry typed-key leaves; pass the same ``prng_impl`` to
    ``make_train_step``.

    ``img_norm``: ``(mean, std)`` for uint8 image batches (the
    on-device-normalize train feed, ``apis/prep.py``) — normalization
    happens inside the init jit; float batches pass through untouched."""
    from .prep import make_device_prep
    prep = make_device_prep(img_norm) if img_norm else make_device_prep()
    if prng_impl in _THREEFRY:
        key = jax.random.PRNGKey(seed)
        pkey, dkey, rkey = jax.random.split(key, 3)
    else:
        key = jax.random.key(seed, impl=prng_impl)
        pkey, dkey, rk = jax.random.split(key, 3)
        rkey = jax.random.key_data(rk)

    variables = jax.jit(
        lambda: model.init({"params": pkey, "dropout": dkey}, prep(batch),
                           train=True))()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if tx is None:
        tx = build_optimizer(params, **(tx_kwargs or {}))
    opt_state = jax.jit(tx.init)(params)
    # distinct buffers: aliasing params would double-donate under jit
    ema = jax.tree.map(jnp.copy, params) if ema_decay > 0 else None
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state,
                      rng=rkey, ema_params=ema), tx


def make_train_step(model, tx, mesh=None, axis_name: str = "data",
                    donate: bool = True, ema_decay: float = 0.0,
                    prng_impl: Optional[str] = None, img_norm=None):
    """Build the jitted (optionally mesh-sharded) train step.

    Batch axis sharded over the mesh; state replicated.  Matching, losses
    and the optimizer all run inside the single jit — no host round trips
    (the reference crossed to CPU per image per decoder layer for scipy
    Hungarian; SURVEY.md §3.1).

    Models with trainable BatchNorm (``norm_eval=False``, DK-DETR) update
    their ``batch_stats`` in the step; frozen-BN models (every pose
    production config) leave them untouched.
    """
    trainable_bn = not getattr(model, "norm_eval", True)
    from .prep import make_device_prep
    prep = make_device_prep(img_norm) if img_norm else make_device_prep()

    def step_fn(state: TrainState, batch):
        # uint8 feeds normalize + re-zero padding in-jit (apis/prep.py:
        # 4x less tunnel payload and host RSS leak); float feeds untouched
        batch = prep(batch)
        if prng_impl in _THREEFRY:
            rng, dropout_key = jax.random.split(state.rng)
        else:
            k1, dropout_key = jax.random.split(
                jax.random.wrap_key_data(state.rng, impl=prng_impl))
            rng = jax.random.key_data(k1)

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state.batch_stats}
            if trainable_bn:
                losses, mutated = model.apply(
                    variables, batch, train=True,
                    rngs={"dropout": dropout_key},
                    mutable=["batch_stats"])
                new_stats = mutated["batch_stats"]
            else:
                losses = model.apply(variables, batch, train=True,
                                     rngs={"dropout": dropout_key})
                new_stats = state.batch_stats
            return losses["loss"], (losses, new_stats)

        (_, (losses, batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None and ema_decay > 0:
            ema = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1 - ema_decay),
                ema, params)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=batch_stats,
                                  opt_state=opt_state, rng=rng,
                                  ema_params=ema)
        return new_state, losses

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        step_fn,
        in_shardings=(replicated, sharded),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,) if donate else ())
