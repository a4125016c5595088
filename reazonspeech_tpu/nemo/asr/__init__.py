"""reazonspeech_tpu.nemo.asr — FastConformer-RNNT (nemo-v2 flavor) ASR.

Drop-in surface for the reference package ``reazonspeech.nemo.asr``
(pkg/nemo-asr/src/__init__.py): same function names, dataclasses, and output
semantics, with the NeMo/PyTorch backend replaced by first-party JAX running
on TPU.
"""

from ...core.audio import (
    audio_from_numpy,
    audio_from_path,
    audio_from_tensor,
    audio_to_file,
    norm_audio,
    pad_audio,
)
from ...core.interface import (
    AudioData,
    Segment,
    Subword,
    TranscribeConfig,
    TranscribeResult,
)
from .transcribe import load_model, transcribe

__all__ = [
    "TranscribeConfig",
    "TranscribeResult",
    "AudioData",
    "Subword",
    "Segment",
    "transcribe",
    "load_model",
    "audio_from_numpy",
    "audio_from_tensor",
    "audio_from_path",
    "audio_to_file",
    "norm_audio",
    "pad_audio",
]
