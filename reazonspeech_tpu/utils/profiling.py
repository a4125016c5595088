"""Observability: RTFx counters and device tracing.

The reference ships no tracing or throughput metrics (SURVEY.md §5 —
tqdm progress bars only). The TPU build makes RTFx (audio seconds processed
per wall-clock second) a first-class metric since it is the headline
benchmark number, and wraps jax.profiler for device traces.
"""

import contextlib
import time

__all__ = ["RTFxMeter", "trace"]


class RTFxMeter:
    """Accumulate (audio_seconds, wall_seconds) and report throughput.

    Usage:
        meter = RTFxMeter()
        with meter.measure(audio_seconds=30.0 * batch):
            run_pipeline(...)
        print(meter.rtfx)
    """

    def __init__(self):
        self.audio_seconds = 0.0
        self.wall_seconds = 0.0
        self.batches = 0

    @contextlib.contextmanager
    def measure(self, audio_seconds: float):
        t0 = time.perf_counter()
        yield
        self.wall_seconds += time.perf_counter() - t0
        self.audio_seconds += audio_seconds
        self.batches += 1

    @property
    def rtfx(self) -> float:
        if self.wall_seconds == 0:
            return 0.0
        return self.audio_seconds / self.wall_seconds

    @property
    def rtf(self) -> float:
        """Real-time factor (wall per audio second; < 1 is faster than RT)."""
        return 1.0 / self.rtfx if self.rtfx else float("inf")

    def summary(self) -> dict:
        return {
            "rtfx": round(self.rtfx, 1),
            "audio_seconds": round(self.audio_seconds, 3),
            "wall_seconds": round(self.wall_seconds, 4),
            "batches": self.batches,
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace for the enclosed block; view with
    TensorBoard or xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
