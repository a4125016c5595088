"""transcribe(): the nemo-flavor public entry point.

API and output parity with the reference (pkg/nemo-asr/src/transcribe.py:30-60):
pad 0.5 s of silence both sides, decode, run the identical timestamp/segment
math. The inference backend is the jitted JAX pipeline in model.py instead of
NeMo/PyTorch.
"""

import numpy as np

from ...core.audio import norm_audio, pad_audio
from ...core.interface import TranscribeConfig, TranscribeResult
from .decode import PAD_SECONDS, Hypothesis, decode_hypothesis
from .model import BUCKET_SAMPLES, NemoTPUModel, load_model

__all__ = ["transcribe", "transcribe_batch", "load_model"]


def transcribe(model: NemoTPUModel, audio, config=None) -> TranscribeResult:
    """Transcribe audio data with the TPU model.

    Args:
        model (NemoTPUModel): ReazonSpeech TPU model (see load_model)
        audio (AudioData): audio data to transcribe
        config (TranscribeConfig): additional settings

    Returns:
        TranscribeResult
    """
    if config is None:
        config = TranscribeConfig()

    audio = pad_audio(norm_audio(audio), PAD_SECONDS)

    tokens, frames = model.decode_single(audio.waveform)
    hyp = Hypothesis.from_greedy(tokens, frames, model.rnnt_cfg.blank_id)

    ret = decode_hypothesis(model, hyp)

    if config.raw_hypothesis:
        ret.hypothesis = hyp

    return ret


def transcribe_batch(model: NemoTPUModel, audios, config=None):
    """Transcribe a batch of utterances in one device program.

    TPU-first extension over the reference (which fixes batch_size=1,
    pkg/nemo-asr/src/transcribe.py:48-50): utterances are padded to one
    bucket and decoded together — this is the throughput path the RTFx
    benchmark measures.

    Args:
        model (NemoTPUModel)
        audios (list[AudioData])
        config (TranscribeConfig)

    Returns:
        list[TranscribeResult]
    """
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
        hyp = Hypothesis.from_greedy(
            tokens[i, :c].tolist(), frames[i, :c].tolist(), model.rnnt_cfg.blank_id
        )
        ret = decode_hypothesis(model, hyp)
        if config.raw_hypothesis:
            ret.hypothesis = hyp
        results.append(ret)
    return results
