"""Production serving: micro-batching execution + a minimal HTTP front.

The reference is a library; serving is left to the caller. On TPU the
economics make batching mandatory (the chip's throughput plateau sits at
B≈64-128 30 s chunks, BENCHMARKS.md), so this package provides the piece a
deployment actually needs: a MicroBatcher that coalesces concurrent requests
into bucketed jitted calls, and an HTTP server exposing it.
"""

from .avsr import AVSRBatcher
from .batcher import MicroBatcher
from .continuous import ContinuousBatcher
from .http import serve

__all__ = ["AVSRBatcher", "ContinuousBatcher", "MicroBatcher", "serve"]
