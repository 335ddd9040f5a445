"""Logging + metric averaging (reference: mmcv LogBuffer / get_root_logger)."""
from __future__ import annotations

import logging
from collections import OrderedDict, defaultdict

import numpy as np

_LOGGERS = {}


def get_root_logger(log_file=None, log_level=logging.INFO,
                    name="pavenet_tpu"):
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    logger.setLevel(log_level)
    logger.propagate = False
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None:
        fh = logging.FileHandler(log_file, "a")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    _LOGGERS[name] = logger
    return logger


class MetricSinks:
    """Scalar metric sinks (the reference's TextLoggerHook siblings:
    ``mmcv/runner/hooks/logger/{tensorboard,wandb}.py``).

    Always writes JSONL (``<work_dir>/metrics.jsonl``); adds TensorBoard
    and Weights & Biases sinks when their packages are importable (the
    baked image has neither — they are optional accelerants, not deps).
    """

    def __init__(self, work_dir=None, use_tensorboard=True,
                 use_wandb=False, wandb_init_kwargs=None):
        self._jsonl = None
        self._tb = None
        self._wandb = None
        if work_dir is not None:
            import os
            self._jsonl = open(
                os.path.join(work_dir, "metrics.jsonl"), "a")
        if use_tensorboard and work_dir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=f"{work_dir}/tf_logs")
            except Exception:
                self._tb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(**(wandb_init_kwargs or {}))
            except Exception:
                self._wandb = None

    def log(self, step: int, scalars: dict):
        if self._jsonl is not None:
            import json
            self._jsonl.write(json.dumps(
                dict(step=int(step), **{k: float(v)
                                        for k, v in scalars.items()})) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))
        if self._wandb is not None:
            self._wandb.log(dict(scalars), step=int(step))

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class LogBuffer:
    """Windowed scalar averaging for train-loop logging."""

    def __init__(self):
        self.val_history = defaultdict(list)
        self.n_history = defaultdict(list)
        self.output = OrderedDict()
        self.ready = False

    def clear(self):
        self.val_history.clear()
        self.n_history.clear()
        self.clear_output()

    def clear_output(self):
        self.output.clear()
        self.ready = False

    def update(self, vars_dict, count=1):
        for key, var in vars_dict.items():
            self.val_history[key].append(float(var))
            self.n_history[key].append(count)

    def average(self, n=0):
        """Average the latest ``n`` values (all if ``n == 0``)."""
        for key in self.val_history:
            values = np.array(self.val_history[key][-n or None:])
            nums = np.array(self.n_history[key][-n or None:])
            self.output[key] = float((values * nums).sum() / nums.sum())
        self.ready = True
