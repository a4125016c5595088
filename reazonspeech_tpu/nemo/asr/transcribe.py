"""transcribe(): the nemo-flavor public entry point.

API and output parity with the reference (pkg/nemo-asr/src/transcribe.py:30-60):
pad 0.5 s of silence both sides, decode, run the identical timestamp/segment
math. The inference backend is the jitted JAX pipeline in model.py instead of
NeMo/PyTorch.
"""

from ...core.audio import norm_audio, pad_audio
from ...core.interface import TranscribeConfig, TranscribeResult
from .decode import PAD_SECONDS, Hypothesis, decode_hypothesis
from .model import NemoTPUModel, load_model

__all__ = ["transcribe", "load_model"]


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
