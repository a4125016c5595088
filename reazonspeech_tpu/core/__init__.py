from .interface import (
    AudioData,
    Segment,
    Subword,
    TranscribeConfig,
    TranscribeResult,
)

__all__ = [
    "AudioData",
    "Segment",
    "Subword",
    "TranscribeConfig",
    "TranscribeResult",
]
