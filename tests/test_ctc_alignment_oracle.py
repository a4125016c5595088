"""Gate the production CTC forced aligner against the CTC-segmentation
paper's DP (tools/ctc_segmentation_oracle.py — the published algorithm behind
the ``ctc_segmentation`` C extension the reference calls at
pkg/espnet-asr/src/ctc.py:60-72).

The production aligner (decoding/ctc.py::ctc_viterbi_align) runs the standard
blank-interleaved CTC topology; the oracle runs the paper's trellis. The only
topological difference (identical consecutive labels need an intervening
blank frame in standard CTC, not in the paper's trellis) bounds per-character
disagreement at one frame on peaked posteriors — the gate enforces exactly
that tolerance, so any timing drift in the production DP fails here.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from ctc_segmentation_oracle import (  # noqa: E402
    ctc_segmentation_align,
    ctc_segmentation_timings,
)

from reazonspeech_tpu.decoding.ctc import ctc_viterbi_align, get_timings


def _peaked_lpz(seed, t_len, vocab, tokens, peak=0.90, blank_id=0):
    """Synthesize a realistic peaked CTC posterior: each token occupies a
    contiguous frame run along a random monotone path, blanks fill gaps,
    off-path mass is uniform noise."""
    rng = np.random.default_rng(seed)
    l_len = len(tokens)
    # random segment begins (strictly increasing, room for every token)
    cuts = np.sort(rng.choice(np.arange(1, t_len), size=2 * l_len, replace=False))
    path = np.full(t_len, blank_id, np.int64)
    for j in range(l_len):
        path[cuts[2 * j]: cuts[2 * j + 1]] = tokens[j]
    probs = rng.uniform(0.01, 1.0, size=(t_len, vocab))
    probs[np.arange(t_len), path] = 0.0
    probs = (1 - peak) * probs / probs.sum(axis=1, keepdims=True)
    probs[np.arange(t_len), path] = peak
    return np.log(probs)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_viterbi_matches_paper_dp_on_peaked_posteriors(seed):
    rng = np.random.default_rng(100 + seed)
    vocab, t_len, l_len = 30, 80, 9
    tokens = rng.integers(1, vocab, size=l_len)
    lpz = _peaked_lpz(seed, t_len, vocab, tokens)

    want, want_lp = ctc_segmentation_align(lpz, tokens)
    got = ctc_viterbi_align(lpz, tokens)
    assert want.shape == got.shape == (l_len,)
    assert np.isfinite(want_lp)
    np.testing.assert_array_less(
        np.abs(got.astype(int) - want.astype(int)), 2,
        err_msg=f"timing drift beyond 1 frame: got={got} oracle={want}",
    )


def test_repeated_labels_within_one_frame():
    """The one documented topological divergence: identical consecutive
    labels. Standard CTC forces a blank frame between them; the paper's
    trellis does not — begin frames may differ by at most one frame."""
    tokens = np.array([5, 5, 7, 7, 7], np.int64)
    lpz = _peaked_lpz(42, 60, 12, tokens, peak=0.95)
    want, _ = ctc_segmentation_align(lpz, tokens)
    got = ctc_viterbi_align(lpz, tokens)
    assert np.all(np.abs(got.astype(int) - want.astype(int)) <= 1), (got, want)


def test_oracle_monotone_and_begin_semantics():
    """Oracle self-checks: begin frames strictly increase and land inside
    the planted segments."""
    rng = np.random.default_rng(7)
    tokens = rng.integers(1, 20, size=6)
    lpz = _peaked_lpz(7, 64, 20, tokens, peak=0.97)
    begin, lp = ctc_segmentation_align(lpz, tokens)
    assert np.all(np.diff(begin) > 0)
    assert np.isfinite(lp)
    # with 0.97 peaks the arg-max path IS the planted path: every begin frame
    # must emit its own token at the posterior mode
    assert np.all(np.argmax(lpz[begin], axis=1) == tokens)


def test_timings_units_match_reference_formula():
    """Both timing helpers use the reference's sample units
    (frame * nsamples / (T + 1), pkg/espnet-asr/src/ctc.py:63)."""
    tokens = np.array([3, 9, 4], np.int64)
    lpz = _peaked_lpz(3, 50, 16, tokens)
    nsamples = 16000 * 5
    ours = get_timings(lpz, tokens, nsamples)
    oracle = ctc_segmentation_timings(lpz, tokens, nsamples)
    dur = nsamples / (50 + 1)
    assert np.all(np.abs(ours - oracle) <= dur + 1e-6)


def test_empty_and_degenerate_inputs():
    lpz = _peaked_lpz(0, 10, 8, np.array([2], np.int64))
    frames, lp = ctc_segmentation_align(lpz, np.zeros((0,), np.int64))
    assert frames.size == 0
    frames, lp = ctc_segmentation_align(lpz[:2], np.array([1, 2, 3], np.int64))
    assert frames.size == 0
