"""espnet-flavor public dataclasses (parity: pkg/espnet-asr/src/interface.py)."""

from dataclasses import dataclass

import numpy as np

from ...core.interface import AudioData, Segment

__all__ = ["AudioData", "Segment", "TranscribeResult", "TranscribeConfig"]


@dataclass
class TranscribeResult:
    text: str
    segments: list


@dataclass
class TranscribeConfig:
    verbose: bool = True
