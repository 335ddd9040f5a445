from .deformable import (
    MultiScaleDeformableAttention,
    MultiFrameDeformableAttention,
    MultiFramePoseDeformableAttention,
)

__all__ = [
    "MultiScaleDeformableAttention",
    "MultiFrameDeformableAttention",
    "MultiFramePoseDeformableAttention",
]
