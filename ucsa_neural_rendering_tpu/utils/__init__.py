from .logger import MetricsLogger, get_logger
from .profiling import StepTimer, maybe_trace

__all__ = ["MetricsLogger", "get_logger", "StepTimer", "maybe_trace"]
