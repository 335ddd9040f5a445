from .logging import get_root_logger, LogBuffer, MetricSinks
from .seed import set_random_seed

__all__ = ["get_root_logger", "LogBuffer", "MetricSinks",
           "set_random_seed"]
