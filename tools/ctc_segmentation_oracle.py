"""Host-side NumPy oracle for CTC forced-alignment timings.

The reference aligns text to audio through the ``ctc_segmentation`` C
extension (pkg/espnet-asr/src/ctc.py:60-72, pkg/_v1/src/transcribe.py:62-74,
pkg/espnet-oneseg/src/align.py) — unavailable in this image and deliberately
NOT ported. This module implements the *published algorithm* that package
realises — the dynamic program of Kürzinger et al. 2020, "CTC-Segmentation of
Large Corpora for German End-to-End Speech Recognition" (arXiv:2007.09127,
§2 eq. 2-3) — from the paper's recurrence, as a slow O(T·L) NumPy oracle:

    k_{t,j} = max( k_{t-1,j} · p_t(blank),      # stay: blank frame
                   k_{t-1,j} · p_t(c_j),        # stay: token j repeats
                   k_{t-1,j-1} · p_t(c_j) )     # advance: token j begins

i.e. the most probable monotone alignment in which every ground-truth token
occupies at least one frame, with optional blanks before/between/after
tokens. The begin time of token j is the frame of its ``advance`` transition
on the arg-max path.

The production aligner (reazonspeech_tpu/decoding/ctc.py::ctc_viterbi_align)
is a vectorised on-device Viterbi over the standard blank-interleaved CTC
state graph. The two trellises differ in exactly one documented respect: the
paper's trellis lets token j+1 begin directly after token j even when the two
labels are identical, while the standard CTC topology requires an
intervening blank frame between identical labels. On peaked (realistic)
posteriors this shifts a repeated character's begin frame by at most one
frame; tests/test_ctc_alignment_oracle.py gates the production aligner
against this oracle at a ≤1-frame-per-character tolerance.
"""

import numpy as np

__all__ = ["ctc_segmentation_align", "ctc_segmentation_timings"]

_NEG_INF = -np.inf


def ctc_segmentation_align(log_probs, token_ids, blank_id=0):
    """Most-probable-alignment begin frames per the CTC-segmentation paper.

    Args:
      log_probs: [T, V] log-softmax CTC posteriors (any float dtype)
      token_ids: [L] ground-truth token ids (no blanks)
      blank_id: CTC blank id

    Returns:
      (begin_frames [L] int32, path_logprob float) — empty frames if no
      valid alignment exists (T < L or L == 0).
    """
    lp = np.asarray(log_probs, np.float64)
    tok = np.asarray(token_ids, np.int64)
    t_len, _ = lp.shape
    l_len = len(tok)
    if l_len == 0 or t_len < l_len:
        return np.zeros((0,), np.int32), _NEG_INF

    # kb[j]: best log-prob with j tokens completed, current frame blank
    # kc[j]: best log-prob with j tokens completed, current frame = token j
    kb = np.full(l_len + 1, _NEG_INF)
    kc = np.full(l_len + 1, _NEG_INF)
    kb[0] = lp[0, blank_id]
    kc[1] = lp[0, tok[0]]
    # backpointers: for each t, was kc[t, j] reached by an advance?
    adv_bp = np.zeros((t_len, l_len + 1), bool)
    # and was the best predecessor of the stay/advance a char state (True)
    # or a blank state (False)? Needed to walk the path backwards exactly.
    kb_from_char = np.zeros((t_len, l_len + 1), bool)
    adv_from_char = np.zeros((t_len, l_len + 1), bool)
    adv_bp[0, 1] = True

    for t in range(1, t_len):
        p_blank = lp[t, blank_id]
        p_tok = lp[t, tok]  # [L], token j at index j-1
        new_kb = np.maximum(kb, kc) + p_blank
        kb_from_char[t] = kc > kb
        stay_c = kc[1:] + p_tok  # token j repeats
        prev_best = np.maximum(kb[:-1], kc[:-1])  # completed j-1 tokens
        adv_c = prev_best + p_tok  # token j begins at frame t
        new_kc = np.full(l_len + 1, _NEG_INF)
        new_kc[1:] = np.maximum(stay_c, adv_c)
        adv_bp[t, 1:] = adv_c > stay_c
        adv_from_char[t, 1:] = kc[:-1] > kb[:-1]
        kb, kc = new_kb, new_kc

    final = max(kb[l_len], kc[l_len])
    if not np.isfinite(final):
        return np.zeros((0,), np.int32), _NEG_INF

    # backtrack: walk (t, j, in_char) to the advance frame of every token
    begin = np.zeros(l_len, np.int32)
    j = l_len
    in_char = kc[l_len] > kb[l_len]
    for t in range(t_len - 1, -1, -1):
        if in_char:
            if adv_bp[t, j]:
                begin[j - 1] = t
                in_char = adv_from_char[t, j]
                j -= 1
            # else: token j repeated; stay in_char at same j
        else:
            in_char = kb_from_char[t, j]
    return begin, float(final)


def ctc_segmentation_timings(log_probs, token_ids, nsamples, blank_id=0):
    """Per-token sample offsets in the reference's units (index_duration =
    nsamples / (T + 1), pkg/espnet-asr/src/ctc.py:63)."""
    frames, _ = ctc_segmentation_align(log_probs, token_ids, blank_id)
    t_len = np.asarray(log_probs).shape[0]
    return frames.astype(np.float64) * (nsamples / (t_len + 1))
