"""reazonspeech_tpu.espnet.asr — Conformer-Transducer (espnet-v2 flavor) ASR.

Drop-in surface for the reference package ``reazonspeech.espnet.asr``
(pkg/espnet-asr/src/__init__.py): long-form chunked decoding with CTC-guided
chunk boundaries and per-segment timestamps.
"""

from ...core.audio import (
    audio_from_numpy,
    audio_from_path,
    audio_from_tensor,
    norm_audio,
)
from .interface import AudioData, Segment, TranscribeConfig, TranscribeResult
from .transcribe import load_model, transcribe

__all__ = [
    "TranscribeConfig",
    "TranscribeResult",
    "AudioData",
    "Segment",
    "transcribe",
    "load_model",
    "audio_from_numpy",
    "audio_from_tensor",
    "audio_from_path",
    "norm_audio",
]
