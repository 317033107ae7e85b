from .profiler import Profiler, xla_trace

__all__ = ["Profiler", "xla_trace"]
