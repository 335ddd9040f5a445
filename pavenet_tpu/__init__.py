"""pavenet_tpu: TPU-native multi-person (video) pose estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the PyTorch/CUDA
reference (zgspose/PAVENet: OPERA + PETR + PAVE-Net), designed TPU-first:
static shapes, SPMD data-parallel meshes, XLA/Pallas deformable attention,
in-jit Hungarian matching and OKS-NMS.
"""
__version__ = "0.1.0"

from .config import Config, ConfigDict, DictAction
from .registry import MODELS, LOSSES, DATASETS, PIPELINES

__all__ = [
    "__version__", "Config", "ConfigDict", "DictAction",
    "MODELS", "LOSSES", "DATASETS", "PIPELINES",
]
