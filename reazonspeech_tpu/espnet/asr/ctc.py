"""espnet-flavor CTC utilities: blank detection, alignment, segmentation.

Signature and behavior parity with the reference module
(pkg/espnet-asr/src/ctc.py:1-101), with the external ctc_segmentation C
extension replaced by the first-party Viterbi alignment kernel
(reazonspeech_tpu.decoding.ctc) and the CTC matrix produced by our own
encoder — the 3× encoder recompute noted in SURVEY.md §3.3 becomes one pass
(the lpz from decode is reused for alignment).
"""

import numpy as np

from ...decoding.ctc import Blank, ctc_viterbi_align
from ...decoding.ctc import find_blank as _find_blank_lpz

__all__ = [
    "ctc_decode",
    "find_blank",
    "get_timings",
    "find_end_of_segment",
    "split_text",
]

TOKEN_EOS = {"。", "?", "!"}
TOKEN_COMMA = {"、", ","}
TOKEN_PUNC = TOKEN_EOS | TOKEN_COMMA
PHONEMIC_BREAK = 8000  # samples (reference: pkg/espnet-asr/src/ctc.py:9)
CHARS_PER_SEGMENT = 15


def ctc_decode(model, samples):
    """Character probabilities per frame using the CTC network
    (parity: pkg/espnet-asr/src/ctc.py:12-27)."""
    return model.ctc_probs(np.asarray(samples, np.float32))


def find_blank(model, samples, threshold=0.98):
    """Find the longest no-speech segment in an audio chunk
    (parity: pkg/espnet-asr/src/ctc.py:29-58; see arXiv:2002.00551)."""
    lpz = ctc_decode(model, samples)
    return _find_blank_lpz(lpz, len(samples), model.blank_id, threshold)


def _text_to_token_ids(model, text):
    """Map text characters to token-list ids; raises KeyError on unknown
    chars (split_text's fallback then returns the whole-audio segment, the
    same degradation the reference exhibits)."""
    return model.tokenizer.tokens_to_ids(list(text))


def get_timings(model, samples, text, lpz_log=None):
    """Playback timing (in samples) of each character
    (parity: pkg/espnet-asr/src/ctc.py:60-72)."""
    samples = np.asarray(samples, np.float32)
    if lpz_log is None:
        lpz = ctc_decode(model, samples)
        lpz_log = np.log(np.maximum(lpz, 1e-10))
    ids = _text_to_token_ids(model, text)
    frames = ctc_viterbi_align(lpz_log, ids, model.blank_id)
    if len(frames) != len(text):
        raise ValueError("alignment failed")
    index_duration = len(samples) / (lpz_log.shape[0] + 1)
    return frames.astype(np.float64) * index_duration


def find_end_of_segment(text, timings, start):
    """(parity: pkg/espnet-asr/src/ctc.py:74-86)"""
    nchar = len(text)
    idx = start
    for idx in range(start, nchar):
        if idx < nchar - 1:
            cur = text[idx]
            nex = text[idx + 1]
            if nex not in TOKEN_PUNC:
                if cur in TOKEN_EOS:
                    break
                elif idx - start >= CHARS_PER_SEGMENT:
                    if (
                        cur in TOKEN_COMMA
                        or timings[idx + 1] - timings[idx] > PHONEMIC_BREAK
                    ):
                        break
    return idx


def split_text(model, samples, text, lpz_log=None):
    """Split text into (start_sample, end_sample, text) segments
    (parity: pkg/espnet-asr/src/ctc.py:88-101, including the whole-audio
    fallback on any alignment failure)."""
    try:
        timings = get_timings(model, samples, text, lpz_log=lpz_log)
    except Exception:
        return [(0, len(samples), text)]

    ret = []
    start = 0
    while start < len(text):
        end = find_end_of_segment(text, timings, start)
        ret.append((timings[start], timings[end], text[start : end + 1]))
        start = end + 1
    return ret
