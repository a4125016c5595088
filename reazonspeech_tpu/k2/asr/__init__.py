"""reazonspeech_tpu.k2.asr — Zipformer transducer (k2-v2 flavor) ASR,
including the bilingual ja-en models.

Drop-in surface for the reference package ``reazonspeech.k2.asr``
(pkg/k2-asr/src/__init__.py).
"""

from ...core.audio import (
    audio_from_numpy,
    audio_from_path,
    audio_from_tensor,
    audio_to_file,
    norm_audio,
    pad_audio,
)
from .huggingface import load_model
from .interface import AudioData, Subword, TranscribeConfig, TranscribeResult
from .transcribe import transcribe

__all__ = [
    "TranscribeConfig",
    "TranscribeResult",
    "AudioData",
    "Subword",
    "load_model",
    "transcribe",
    "audio_from_numpy",
    "audio_from_tensor",
    "audio_from_path",
    "audio_to_file",
    "norm_audio",
    "pad_audio",
]
