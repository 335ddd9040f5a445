from .transforms import (
    Compose, LoadClip, PhotoMetricDistortion, KeypointRandomAffine,
    RandomFlip, Resize, RandomCrop, Normalize, PadToBucket, FormatBatch,
    build_train_pipeline, build_test_pipeline,
)

__all__ = [
    "Compose", "LoadClip", "PhotoMetricDistortion", "KeypointRandomAffine",
    "RandomFlip", "Resize", "RandomCrop", "Normalize", "PadToBucket",
    "FormatBatch", "build_train_pipeline", "build_test_pipeline",
]
