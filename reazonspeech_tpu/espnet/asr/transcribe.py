"""Long-form chunked transcription (espnet flavor).

Flow parity with the reference (pkg/espnet-asr/src/transcribe.py:34-82):
20 s sliding window, cut at the longest CTC-blank run's midpoint, pad
(1.0 s, 0.5 s), decode, split into timed segments. TPU-side improvement: the
chunk's encoder pass is computed once and shared between decode and
alignment (the reference runs the encoder 3× per chunk, SURVEY.md §3.3).
"""

import numpy as np
import tqdm

from ...core.audio import norm_audio
from .ctc import find_blank, split_text
from .interface import Segment, TranscribeConfig, TranscribeResult
from .model import EspnetTPUModel, load_model_container

# Hyper parameters (reference: pkg/espnet-asr/src/transcribe.py:8-10)
WINDOW_SECONDS = 20
PADDING = (16000, 8000)

__all__ = ["transcribe", "load_model", "WINDOW_SECONDS", "PADDING"]


def load_model(device=None, **kwargs) -> EspnetTPUModel:
    """Load the ReazonSpeech espnet-v2 flavor model (API parity:
    pkg/espnet-asr/src/transcribe.py:12-32; device accepted for
    compatibility, placement is JAX's)."""
    del device
    return load_model_container(**kwargs)


def transcribe(model: EspnetTPUModel, audio, config=None) -> TranscribeResult:
    """Transcribe audio data (flow parity: pkg/espnet-asr/src/transcribe.py:34-82).

    Args:
      model (EspnetTPUModel): ReazonSpeech TPU model
      audio (AudioData): audio to transcribe
      config (TranscribeConfig): additional settings

    Returns:
      TranscribeResult
    """
    if config is None:
        config = TranscribeConfig()

    audio = norm_audio(audio)

    pos = 0
    fulltext = ""
    segments = []

    window = int(WINDOW_SECONDS * audio.samplerate)
    pbar = tqdm.tqdm(
        total=len(audio.waveform), desc="Transcribe", disable=not config.verbose
    )

    with pbar:
        while pos < len(audio.waveform):
            samples = audio.waveform[pos:]

            # For long audio, cut at the longest non-speech region so chunk
            # boundaries never split a word.
            if len(samples) > window:
                blank = find_blank(model, samples[:window])
                mid = int((blank.start + blank.end) / 2)
                samples = samples[:mid]

            padded = np.pad(samples, PADDING, mode="constant")
            token_ids, lpz_log = model.decode_with_ctc(padded)
            asr = model.ids_to_text(token_ids)
            fulltext += asr

            # Alignment reuses the decode pass's CTC matrix (computed over
            # the padded chunk); timings come back in padded-sample
            # coordinates and are shifted by the front padding.
            for start, end, text in split_text(model, padded, asr, lpz_log=lpz_log):
                start = min(max(start - PADDING[0], 0), len(samples))
                end = min(max(end - PADDING[0], 0), len(samples))
                segments.append(
                    Segment(
                        start_seconds=((pos + start) / audio.samplerate),
                        end_seconds=((pos + end) / audio.samplerate),
                        text=text,
                    )
                )
            pos += len(samples)
            pbar.n = pos
            pbar.refresh()

    return TranscribeResult(fulltext, segments)
