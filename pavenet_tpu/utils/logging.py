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
