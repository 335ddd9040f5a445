from . import builder  # registers detector types
from .detectors.videopose import VideoPoseDetector
from .detectors.soit import SOITDetector
from .detectors.inspose import InsPoseDetector
from .builder import build_detector, build_model

__all__ = [
    "VideoPoseDetector", "SOITDetector", "InsPoseDetector",
    "build_detector", "build_model",
]
