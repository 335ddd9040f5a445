"""Encoder distillation: windowed-encoder student <- parity teacher.

Backs the accuracy story for the opt-in TPU-mode windowed encoder
(``models/layers/windowed.py``; PERF_NOTES "Round 3: opt-in TPU-mode
windowed encoder").  The parity (deformable-encoder) model — the variant
that CAN load converted reference weights — acts as a frozen oracle.
The student shares every parameter outside ``head/encoder_layer{i}``
(copied verbatim from the teacher and frozen) and trains ONLY its
encoder layers to reproduce the teacher's ``(B, T, N, C)`` memory
tokens.  Because backbone/neck/decoders/branches are identical copies,
memory agreement transfers directly to detection agreement — the
measurable quantity the held-out AP comparison (tools/distill.py)
reports.

No reference counterpart: the reference (zgspose/PAVENet) validates
encoder variants by full training on real PoseTrack data, which this
environment cannot access; distillation against the parity oracle is
the TPU-native substitute that bounds the windowed encoder's accuracy
delta without a dataset.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .train import TrainState


def _is_encoder_key(key: str) -> bool:
    # matches head/encoder_layer{i} ONLY — 'hm_encoder_layer' (identical
    # structure in both modes) stays teacher-copied
    return key.startswith("encoder_layer")


def student_from_teacher(student_params, teacher_params):
    """Copy every shared parameter from the teacher into the student.

    The two trees are identical except the ``head/encoder_layer{i}``
    subtrees (deformable vs windowed layers have different parameter
    shapes); those keep the student's own (fresh) initialization.
    """
    def merge(s, t):
        if not isinstance(s, dict):
            assert jnp.shape(s) == jnp.shape(t), (jnp.shape(s),
                                                  jnp.shape(t))
            # distinct buffer: the student state is donated by the
            # distill step while the teacher rides as a live argument —
            # aliased leaves would be deleted under the donation
            return jnp.copy(t)
        out = {}
        for k, v in s.items():
            if _is_encoder_key(k):
                out[k] = v
            elif k in t:
                out[k] = merge(v, t[k])
            else:
                raise KeyError(f"student param {k!r} missing in teacher")
        return out
    return merge(dict(student_params), dict(teacher_params))


def encoder_only_optimizer(params, learning_rate=1e-4,
                           grad_clip: float = 0.1,
                           weight_decay: float = 1e-4):
    """AdamW over ``head/encoder_layer*`` only; everything else frozen."""
    def label(path, _):
        keys = [getattr(k, "key", str(k)) for k in path]
        return ("train" if any(_is_encoder_key(k) for k in keys)
                else "frozen")

    labels = jax.tree_util.tree_map_with_path(label, params)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.multi_transform(
            {"train": optax.adamw(learning_rate, weight_decay=weight_decay),
             "frozen": optax.set_to_zero()},
            labels))


def memory_distill_loss(model, params, batch_stats, batch, teacher_memory,
                        mask_flatten):
    """Masked-MSE between student memory and (stopped) teacher memory.

    ``mask_flatten``: (B, N) bool, True = padding — padded tokens carry
    no information (both encoders zero/ignore them) and are excluded.
    """
    outs = model.apply({"params": params, "batch_stats": batch_stats},
                       batch["img"], batch["img_shape"],
                       method=model.forward_outputs, deterministic=True)
    mem_s = outs["memory"].astype(jnp.float32)
    mem_t = jax.lax.stop_gradient(teacher_memory).astype(jnp.float32)
    valid = (~mask_flatten)[:, None, :, None].astype(jnp.float32)
    se = ((mem_s - mem_t) ** 2) * valid
    denom = valid.sum() * mem_s.shape[-1] + 1e-6
    mse = se.sum() / denom
    # scale-free diagnostic: relative error vs teacher token energy
    rel = se.sum() / (((mem_t ** 2) * valid).sum() + 1e-6)
    return mse, rel


def make_distill_step(student_model, teacher_model, tx,
                      mesh: Optional[object] = None,
                      axis_name: str = "data", img_norm=None):
    """Jitted (optionally mesh-DP-sharded) distillation step.

    Signature: ``step(state, teacher_variables, batch) -> (state, logs)``.
    Teacher variables ride as an argument (replicated under the mesh) so
    they are not baked into the executable as constants.  uint8 image
    batches (prebaked on-device-normalize feed) are normalized in-jit
    (``apis/prep.py``); both teacher and student see the same tensor.
    """
    from .prep import make_device_prep
    prep = make_device_prep(img_norm) if img_norm else make_device_prep()

    def step_fn(state: TrainState, teacher_variables, batch):
        batch = prep(batch)
        t_outs = teacher_model.apply(
            teacher_variables, batch["img"], batch["img_shape"],
            method=teacher_model.forward_outputs, deterministic=True)
        t_mem = t_outs["memory"]
        mask = t_outs["mask_flatten"]

        def loss_fn(params):
            mse, rel = memory_distill_loss(
                student_model, params, state.batch_stats, batch,
                t_mem, mask)
            return mse, rel

        (mse, rel), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        return new_state, {"distill_mse": mse, "distill_rel": rel}

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(axis_name))
    return jax.jit(step_fn,
                   in_shardings=(replicated, replicated, sharded),
                   out_shardings=(replicated, replicated),
                   donate_argnums=(0,))


def create_distill_state(student_model, teacher_params, batch,
                         seed: int = 0, learning_rate=1e-4,
                         grad_clip: float = 0.1, img_norm=None):
    """Init the student (fresh encoder, teacher-copied everything else)
    and its encoder-only optimizer."""
    from .prep import make_device_prep
    prep = make_device_prep(img_norm) if img_norm else make_device_prep()
    key = jax.random.PRNGKey(seed)
    # init through the TRAIN path so loss-only parameters (RealNVP flows)
    # exist — the saved student checkpoint must stay structurally
    # compatible with tools/train.py / tools/test.py state templates
    variables = jax.jit(
        lambda: student_model.init(
            {"params": key, "dropout": jax.random.fold_in(key, 1)},
            prep(batch), train=True))()
    params = student_from_teacher(variables["params"], teacher_params)
    tx = encoder_only_optimizer(params, learning_rate,
                                grad_clip=grad_clip)
    opt_state = jax.jit(tx.init)(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=opt_state, rng=key)
    return state, tx
