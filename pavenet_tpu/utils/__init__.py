from .logging import get_root_logger, LogBuffer, MetricSinks
from .seed import set_random_seed
from .compile_cache import enable_compilation_cache

__all__ = ["get_root_logger", "LogBuffer", "MetricSinks",
           "set_random_seed", "enable_compilation_cache"]
