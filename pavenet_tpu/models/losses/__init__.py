from .focal_loss import (sigmoid_focal_loss, center_focal_loss,
                         varifocal_loss)
from .oks_loss import oks_overlaps, oks_loss, OKS_SIGMAS
from .rle_loss import rle_loss

__all__ = [
    "sigmoid_focal_loss", "center_focal_loss", "varifocal_loss",
    "oks_overlaps", "oks_loss", "OKS_SIGMAS", "rle_loss",
]
