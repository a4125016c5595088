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
    return _build_result(model, token_ids, frames)


def _build_result(model, token_ids, frames) -> TranscribeResult:
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


def transcribe_batch(model: K2TPUModel, audios, config=None):
    """Transcribe a batch of utterances in one device program (throughput
    path; the reference's sherpa backend is strictly one stream at a time).

    Args:
        model (K2TPUModel)
        audios (list[AudioData])

    Returns:
        list[TranscribeResult]
    """
    import numpy as np

    from .model import BUCKET_SAMPLES

    if config is None:
        config = TranscribeConfig()

    waves = [pad_audio(norm_audio(a), PAD_SECONDS).waveform for a in audios]
    lengths = np.asarray([len(w) for w in waves], np.int32)
    n_max = int(lengths.max())
    padded_n = max(BUCKET_SAMPLES, -(-n_max // BUCKET_SAMPLES) * BUCKET_SAMPLES)
    buf = np.zeros((len(waves), padded_n), np.float32)
    for i, w in enumerate(waves):
        buf[i, : len(w)] = w

    tokens, frames, counts, _ = model.decode_batch(buf, lengths)
    results = []
    for i in range(len(waves)):
        c = int(counts[i])
        results.append(
            _build_result(model, tokens[i, :c].tolist(), frames[i, :c].tolist())
        )
    return results
