from .logging import get_root_logger, LogBuffer
from .seed import set_random_seed

__all__ = ["get_root_logger", "LogBuffer", "set_random_seed"]
