import numpy as np
import pytest

from reazonspeech_tpu.decoding.ctc import (
    Blank,
    ctc_viterbi_align,
    find_blank,
    find_blank_runs,
    get_timings,
)


def make_lpz(plan, t, v, blank=0, hi=0.98):
    """Probability matrix where frame f strongly predicts plan[f] (else blank)."""
    lpz = np.full((t, v), (1 - hi) / (v - 1), np.float64)
    for f in range(t):
        lpz[f, plan.get(f, blank)] = hi
    return lpz


# ---------------------------------------------------------------------------
# find_blank (reference parity)
# ---------------------------------------------------------------------------

def test_find_blank_finds_longest_run():
    t, v, n = 20, 5, 20000
    # speech at frames 0-4 and 12-19 -> blank run at 5..11
    plan = {f: 1 for f in list(range(5)) + list(range(12, 20))}
    lpz = make_lpz(plan, t, v)
    b = find_blank(lpz, n, blank_id=0, threshold=0.9)
    assert b.start == int(5 / 21 * n)
    assert b.end == int(12 / 21 * n)


def test_find_blank_skips_run_at_zero():
    """Runs starting at frame 0 are excluded (reference behavior: the
    `start and start > 0` guard, pkg/espnet-asr/src/ctc.py:52)."""
    t, v, n = 10, 5, 10000
    plan = {f: 2 for f in range(5, 10)}  # blank run 0..4, speech 5..9
    lpz = make_lpz(plan, t, v)
    b = find_blank(lpz, n, blank_id=0, threshold=0.9)
    assert (b.start, b.end) == (n, n)  # sentinel


def test_find_blank_all_speech_sentinel():
    lpz = make_lpz({f: 1 for f in range(8)}, 8, 4)
    b = find_blank(lpz, 8000, blank_id=0, threshold=0.9)
    assert (b.start, b.end) == (8000, 8000)


def test_find_blank_runs():
    plan = {2: 1, 3: 1, 7: 1}
    lpz = make_lpz(plan, 10, 4)
    runs = find_blank_runs(lpz, blank_id=0, threshold=0.9)
    assert runs == [(0, 2), (4, 7), (8, 10)]


# ---------------------------------------------------------------------------
# Viterbi CTC alignment
# ---------------------------------------------------------------------------

def test_viterbi_align_exact():
    """Sharp synthetic lpz: each token occupies known frames."""
    v = 6
    # frames: 0-1 blank, 2-3 token3, 4 blank, 5-6 token1, 7 blank, 8 token4
    plan = {2: 3, 3: 3, 5: 1, 6: 1, 8: 4}
    lpz = make_lpz(plan, 9, v, hi=0.99)
    frames = ctc_viterbi_align(np.log(lpz), [3, 1, 4], blank_id=0)
    assert frames.tolist() == [2, 5, 8]


def test_viterbi_align_repeated_labels():
    """Same label twice must pass through an intervening blank."""
    v = 4
    plan = {1: 2, 2: 2, 4: 2, 5: 2}  # token2 at 1-2 and 4-5, blank at 3
    lpz = make_lpz(plan, 7, v, hi=0.99)
    frames = ctc_viterbi_align(np.log(lpz), [2, 2], blank_id=0)
    assert frames.tolist() == [1, 4]


def test_viterbi_align_empty_and_too_long():
    lpz = np.log(make_lpz({}, 4, 3))
    assert ctc_viterbi_align(lpz, [], blank_id=0).shape == (0,)
    # more tokens than frames -> no path
    assert ctc_viterbi_align(lpz, [1, 2, 1, 2, 1], blank_id=0).shape == (0,)


def test_get_timings_units():
    """Sample offsets use the reference's index_duration = n/(T+1)."""
    v = 4
    plan = {1: 1, 3: 2}
    lpz = make_lpz(plan, 5, v, hi=0.99)
    nsamples = 6000
    tm = get_timings(np.log(lpz), [1, 2], nsamples, blank_id=0)
    np.testing.assert_allclose(tm, [1 * 1000, 3 * 1000])
