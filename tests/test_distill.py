"""Windowed-encoder distillation machinery (apis/distill.py).

Verifies, at tiny sizes on CPU, the three properties tools/distill.py
relies on: (1) the student is an exact parameter copy of the teacher
outside its encoder layers, (2) encoder-only distillation actually
reduces the teacher-student memory divergence AND the downstream
keypoint-prediction divergence (the quantity the held-out AP agreement
measures at scale), (3) the frozen shared parameters do not move.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pavenet_tpu.models.zoo import pavenet_r50_frames3, dummy_clip_batch
from pavenet_tpu.apis.train import create_train_state
from pavenet_tpu.apis.distill import (
    create_distill_state, make_distill_step, student_from_teacher)


def _tiny(mode):
    return pavenet_r50_frames3(
        backbone_depth=18, embed_dims=32, num_encoder_layers=2,
        num_decoder_layers=1, num_refine_layers=1, num_query=12,
        max_gt=4, feedforward_channels=64, dropout=0.0,
        encoder_mode=mode)


@pytest.fixture(scope="module")
def setup():
    teacher = _tiny("deformable")
    student = _tiny("windowed")
    rng = np.random.RandomState(0)
    batch = dummy_clip_batch(rng, batch_size=2, height=96, width=128,
                             max_gt=4, train=True)
    t_state, _ = create_train_state(teacher, batch, seed=1)
    s_state, tx = create_distill_state(student, t_state.params, batch,
                                       seed=2, learning_rate=2e-3)
    return teacher, student, batch, t_state, s_state, tx


def _shared_equal(s_params, t_params, prefix=()):
    """Yield (path, equal) for every shared (non-encoder) leaf."""
    for k, v in s_params.items():
        if k.startswith("encoder_layer"):
            continue
        if isinstance(v, dict):
            yield from _shared_equal(v, t_params[k], prefix + (k,))
        else:
            yield (prefix + (k,),
                   bool(jnp.array_equal(v, t_params[k])))


def test_student_copies_shared_params(setup):
    _, _, _, t_state, s_state, _ = setup
    checked = 0
    for path, eq in _shared_equal(dict(s_state.params),
                                  dict(t_state.params)):
        assert eq, path
        checked += 1
    assert checked > 50  # backbone+neck+decoders all covered
    # and the encoder subtrees genuinely differ in structure
    s_enc = dict(s_state.params)["head"]["encoder_layer0"]
    t_enc = dict(t_state.params)["head"]["encoder_layer0"]
    assert "q_proj" in s_enc and "q_proj" not in t_enc


def test_distillation_reduces_divergence(setup):
    teacher, student, batch, t_state, s_state, tx = setup
    t_vars = {"params": t_state.params, "batch_stats": t_state.batch_stats}
    step = make_distill_step(student, teacher, tx)

    def kpt_div(params, batch_stats):
        """Downstream divergence: final-layer kpt preds + cls scores."""
        outs_s = student.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["img"], batch["img_shape"],
            method=student.forward_outputs)
        outs_t = teacher.apply(
            t_vars, batch["img"], batch["img_shape"],
            method=teacher.forward_outputs)
        return float(jnp.abs(outs_s["all_kpt_preds"][-1]
                             - outs_t["all_kpt_preds"][-1]).mean())

    # the step donates its state argument: everything needed from
    # s_state after stepping must be read through the returned state
    div0 = kpt_div(s_state.params, s_state.batch_stats)
    state = s_state
    first = last = None
    for i in range(60):
        state, logs = step(state, t_vars, batch)
        if i == 0:
            first = float(logs["distill_mse"])
        last = float(logs["distill_mse"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < 0.6 * first, (first, last)

    div1 = kpt_div(state.params, state.batch_stats)
    assert div1 < div0, (div0, div1)

    # frozen shared params must not move
    for path, eq in _shared_equal(dict(state.params),
                                  dict(t_state.params)):
        assert eq, path


def test_student_from_teacher_rejects_mismatch():
    with pytest.raises(KeyError):
        student_from_teacher({"head": {"extra": np.zeros(3)}},
                             {"head": {}})
