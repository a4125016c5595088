from .profiling import RTFxMeter, trace

__all__ = ["RTFxMeter", "trace"]
