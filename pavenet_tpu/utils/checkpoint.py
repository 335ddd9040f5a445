"""Checkpointing via orbax (replaces mmcv ``checkpoint.py`` + hook).

Checkpoint = {step, params, batch_stats, opt_state} plus a small meta dict
(epoch, version), mirroring the reference layout
(``tools/train.py:223-228``).
"""
from __future__ import annotations

import os
import re
from typing import Optional

import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, state, step: int,
                    meta: Optional[dict] = None, max_keep: int = 20):
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    if meta:
        import json
        with open(os.path.join(path, "pavenet_meta.json"), "w") as f:
            json.dump(meta, f)
    _prune(ckpt_dir, max_keep)
    return path


def _prune(ckpt_dir: str, max_keep: int):
    ckpts = sorted(
        (int(m.group(1)), name)
        for name in os.listdir(ckpt_dir)
        for m in [re.match(r"step_(\d+)$", name)] if m)
    for _, name in ckpts[:-max_keep]:
        import shutil
        shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)


def find_latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = sorted(
        (int(m.group(1)), name)
        for name in os.listdir(ckpt_dir)
        for m in [re.match(r"step_(\d+)$", name)] if m)
    return os.path.join(ckpt_dir, ckpts[-1][1]) if ckpts else None


def restore_checkpoint(path: str, target):
    """Restore into the structure of ``target`` (a TrainState or pytree)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def restore_variables(path: str, params_target=None,
                      batch_stats_target=None):
    """Restore just {params, batch_stats} from a TrainState checkpoint
    (inference doesn't rebuild the optimizer state, so a full-structure
    restore would mismatch)."""
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))  # raw, no target
    return {"params": restored["params"],
            "batch_stats": restored.get("batch_stats", {})}
