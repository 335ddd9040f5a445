"""Determinism utilities (reference: opera/apis/train.py:20-69)."""
from __future__ import annotations

import os
import random

import numpy as np


def set_random_seed(seed: int, deterministic: bool = True):
    """Seed host-side RNGs. Device RNG uses explicit jax.random keys.

    JAX is deterministic by construction (explicit PRNG keys), so the
    reference's cudnn-determinism switch has no TPU equivalent; we only seed
    the host libraries used by the data pipeline.
    """
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed
