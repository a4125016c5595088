"""CTC utilities: blank-run detection and forced alignment.

Replaces the reference's external ``ctc_segmentation`` (Cython/C) and its
blank-scan logic (pkg/espnet-asr/src/ctc.py:29-72, pkg/_v1/src/transcribe.py,
pkg/espnet-oneseg/src/align.py) with:

- :func:`find_blank` — an exact behavioral port of the reference's
  longest-blank-run scan over the CTC probability matrix (host-side; the lpz
  matrix is one device→host transfer per chunk);
- :func:`ctc_viterbi_align` — forced alignment as an on-device Viterbi DP
  over the blank-interleaved CTC state graph (lax.scan over frames, states
  vectorized) with host-side backtracking; per-character timings come out in
  the reference's units (samples, via ``index_duration =
  nsamples / (T + 1)``, pkg/espnet-asr/src/ctc.py:63).
"""

import collections
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Blank", "find_blank_runs", "find_blank", "ctc_viterbi_align", "get_timings"]

Blank = collections.namedtuple("Blank", ["start", "end"])

_NEG_INF = -1e30


def find_blank(lpz, nsamples, blank_id=0, threshold=0.98):
    """Find the longest no-speech run in a CTC probability matrix.

    Behavioral parity with pkg/espnet-asr/src/ctc.py:29-58 (including its
    quirks: runs that start at frame 0 are skipped, a trailing run that never
    closes is dropped, and the sentinel (nsamples, nsamples) is returned when
    nothing qualifies).

    Args:
      lpz: [T, V] softmax probabilities (numpy or jax array, host)
      nsamples: waveform sample count the matrix describes
    """
    lpz = np.asarray(lpz)
    blanks = [Blank(nsamples, nsamples)]
    start = None
    denom = lpz.shape[0] + 1
    for idx, prob in enumerate(lpz.T[blank_id]):
        if prob > threshold:
            if start is None:
                start = int(idx / denom * nsamples)
        else:
            if start and start > 0:
                end = int(idx / denom * nsamples)
                blanks.append(Blank(start, end))
            start = None
    return max(blanks, key=lambda b: b.end - b.start)


def find_blank_runs(lpz, blank_id=0, threshold=0.98):
    """All (start_frame, end_frame) blank runs — building block for corpus
    tooling that wants every pause, not just the longest."""
    lpz = np.asarray(lpz)
    mask = lpz.T[blank_id] > threshold
    runs = []
    start = None
    for i, m in enumerate(mask):
        if m and start is None:
            start = i
        elif not m and start is not None:
            runs.append((start, i))
            start = None
    if start is not None:
        runs.append((start, len(mask)))
    return runs


@partial(jax.jit, static_argnames=())
def _viterbi_forward(log_probs, states):
    """CTC Viterbi over the blank-interleaved state sequence.

    log_probs: [T, V] log softmax; states: [S] token id per CTC state
    (blank, c1, blank, c2, ... blank). Returns (best final state among
    {S-1, S-2}, backpointers [T, S] int32).
    """
    t, v = log_probs.shape
    s = states.shape[0]
    state_lp = log_probs[:, states]  # [T, S]

    # allowed skip (s-2 -> s): only onto non-blank states whose token differs
    # from the previous non-blank (standard CTC topology)
    idx = jnp.arange(s)
    can_skip = (idx % 2 == 1) & (idx >= 2)
    same_label = jnp.where(idx >= 2, states == jnp.roll(states, 2), True)
    can_skip = can_skip & ~same_label

    init = jnp.full((s,), _NEG_INF).at[0].set(state_lp[0, 0])
    init = init.at[1].set(jnp.where(s > 1, state_lp[0, 1], _NEG_INF))

    def step(delta, lp_t):
        stay = delta
        diag = jnp.concatenate([jnp.array([_NEG_INF]), delta[:-1]])
        skip = jnp.concatenate([jnp.array([_NEG_INF, _NEG_INF]), delta[:-2]])
        skip = jnp.where(can_skip, skip, _NEG_INF)
        choices = jnp.stack([stay, diag, skip])  # [3, S]
        best = jnp.argmax(choices, axis=0)
        new_delta = jnp.max(choices, axis=0) + lp_t
        return new_delta, best.astype(jnp.int32)

    final, bps = jax.lax.scan(step, init, state_lp[1:])
    return final, bps


def ctc_viterbi_align(log_probs, token_ids, blank_id=0):
    """Force-align a token sequence to a CTC log-prob matrix.

    Args:
      log_probs: [T, V] (numpy or jax) log softmax over tokens
      token_ids: [L] reference tokens (no blanks)

    Returns:
      frames: [L] int32 — first frame occupied by each token on the Viterbi
      path (empty array if L == 0 or no valid path).
    """
    log_probs = jnp.asarray(log_probs, jnp.float32)
    token_ids = np.asarray(token_ids, np.int32)
    l = len(token_ids)
    t = log_probs.shape[0]
    if l == 0 or t < l:
        return np.zeros((0,), np.int32)

    states = np.full(2 * l + 1, blank_id, np.int32)
    states[1::2] = token_ids
    final, bps = _viterbi_forward(log_probs, jnp.asarray(states))
    final = np.asarray(final)
    bps = np.asarray(bps)  # [T-1, S]

    s = 2 * l + 1
    cur = s - 1 if final[s - 1] >= final[s - 2] else s - 2
    if max(final[s - 1], final[s - 2]) <= _NEG_INF / 2:
        return np.zeros((0,), np.int32)

    path = np.zeros(t, np.int32)
    path[t - 1] = cur
    for ti in range(t - 2, -1, -1):
        move = bps[ti, cur]  # 0 stay, 1 diag, 2 skip
        cur = cur - move
        path[ti] = cur

    frames = np.zeros(l, np.int32)
    for i in range(l):
        state = 2 * i + 1
        occ = np.nonzero(path == state)[0]
        frames[i] = occ[0] if len(occ) else (frames[i - 1] if i else 0)
    return frames


def get_timings(lpz_log, token_ids, nsamples, blank_id=0):
    """Per-token sample-offset timings, unit-compatible with the reference's
    ctc_segmentation usage (pkg/espnet-asr/src/ctc.py:60-72): sample =
    frame * nsamples / (T + 1)."""
    frames = ctc_viterbi_align(lpz_log, token_ids, blank_id)
    t = np.asarray(lpz_log).shape[0]
    return frames.astype(np.float64) * (nsamples / (t + 1))
