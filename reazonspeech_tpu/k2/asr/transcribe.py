"""k2-flavor transcribe().

Behavior parity with the reference (pkg/k2-asr/src/transcribe.py:10-45):
0.9 s silence padding both sides, a warning above 30 s of input, greedy
transducer decode, per-subword timestamps on the 0.04 s Zipformer output
grid (relative to the padded waveform start, exactly as sherpa reports them).
"""

import warnings

from ...core.audio import norm_audio, pad_audio
from .interface import Subword, TranscribeConfig, TranscribeResult
from .model import SECONDS_PER_FRAME, K2TPUModel

__all__ = ["transcribe", "PAD_SECONDS", "TOO_LONG_SECONDS"]

PAD_SECONDS = 0.9
TOO_LONG_SECONDS = 30.0


def transcribe(model: K2TPUModel, audio, config=None) -> TranscribeResult:
    """Transcribe audio data with the K2 (Zipformer) TPU model.

    Args:
        model (K2TPUModel): ReazonSpeech TPU model (see huggingface.load_model)
        audio (AudioData): audio data to transcribe
        config (TranscribeConfig): additional settings

    Returns:
        TranscribeResult
    """
    if config is None:
        config = TranscribeConfig()

    audio = pad_audio(norm_audio(audio), PAD_SECONDS)

    duration = audio.waveform.shape[0] / audio.samplerate
    if duration > TOO_LONG_SECONDS:
        warnings.warn(
            f"Passing a long audio input ({duration:.1f}s) is not recommended, "
            "because attention memory grows quadratically with length. "
            "Read the upstream discussion for more details: "
            "https://github.com/k2-fsa/icefall/issues/1680"
        )

    token_ids, frames = model.decode_single(audio.waveform)

    subwords = []
    for tid, frame in zip(token_ids, frames):
        subwords.append(
            Subword(
                token=model.tokenizer.ids_to_tokens([tid])[0],
                seconds=frame * SECONDS_PER_FRAME,
            )
        )

    text = model.tokenizer.ids_to_text(token_ids)
    return TranscribeResult(text, subwords)
