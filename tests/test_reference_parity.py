"""Byte-level parity against fixtures GENERATED FROM the reference's own
pure-Python layers (writers + segmentation heuristic), captured in
tests/fixtures_reference.json. These pin that our implementations produce
identical bytes / identical decisions on randomized inputs, including
pathological timestamps (0-length, x.9999 boundaries, hour wrap)."""

import io
import json
from pathlib import Path

import pytest

from reazonspeech_tpu.core.interface import Segment, Subword
from reazonspeech_tpu.core.writers import (
    ASSWriter,
    JSONWriter,
    SRTWriter,
    TSVWriter,
    TextWriter,
    VTTWriter,
)
from reazonspeech_tpu.nemo.asr.decode import find_end_of_segment

FIXTURES = json.loads(
    (Path(__file__).parent / "fixtures_reference.json").read_text()
)

_WRITERS = {
    "vtt": VTTWriter,
    "srt": SRTWriter,
    "ass": ASSWriter,
    "json": JSONWriter,
    "tsv": TSVWriter,
    "txt": TextWriter,
}


@pytest.mark.parametrize("ext", sorted(_WRITERS))
def test_writer_bytes_match_reference(ext):
    fp = io.StringIO()
    w = _WRITERS[ext](fp)
    w.write_header()
    for start, end, text in FIXTURES["segments"]:
        w.write(Segment(start, end, text))
    assert fp.getvalue() == FIXTURES["writers"][ext]


def test_find_end_of_segment_matches_reference():
    for case in FIXTURES["find_end_cases"]:
        subs = [
            Subword(seconds=s["seconds"], token_id=0, token=s["token"])
            for s in case["subwords"]
        ]
        assert find_end_of_segment(subs, case["start"]) == case["end"], case


def test_espnet_find_end_of_segment_matches_reference():
    from reazonspeech_tpu.espnet.asr.ctc import find_end_of_segment as espnet_fes

    for case in FIXTURES["espnet_find_end_cases"]:
        got = espnet_fes(case["text"], case["timings"], case["start"])
        assert got == case["end"], case


# ---------------------------------------------------------------------------
# round-2 fixture net (tools/gen_reference_fixtures.py): timestamp formula,
# find_blank, split_text, v1 dynamic split, evaluation normalizer
# ---------------------------------------------------------------------------


def test_nemo_decode_hypothesis_matches_reference():
    """Timestamp formula + whitespace trim + segment assembly, end to end."""
    import types

    import numpy as np

    from reazonspeech_tpu.nemo.asr.decode import decode_hypothesis

    for case in FIXTURES["nemo_decode_cases"]:
        vocab = case["vocab"]

        class Tok:
            def ids_to_text(self, ids):
                return "".join(vocab[i] for i in ids)

        model = types.SimpleNamespace(tokenizer=Tok())
        hyp = types.SimpleNamespace(
            y_sequence=np.array([0] + case["ids"]), timestamp=case["steps"]
        )
        res = decode_hypothesis(model, hyp)
        assert res.text == case["text"]
        assert len(res.subwords) == len(case["subwords"])
        for got, want in zip(res.subwords, case["subwords"]):
            assert got.token == want["token"]
            assert got.seconds == pytest.approx(want["seconds"], abs=1e-9)
        assert len(res.segments) == len(case["segments"])
        for got, want in zip(res.segments, case["segments"]):
            assert got.start_seconds == pytest.approx(want[0], abs=1e-9)
            assert got.end_seconds == pytest.approx(want[1], abs=1e-9)
            assert got.text == want[2]


def test_espnet_find_blank_matches_reference():
    import numpy as np

    from reazonspeech_tpu.decoding.ctc import find_blank as find_blank_lpz

    for case in FIXTURES["espnet_find_blank_cases"]:
        col = np.asarray(case["lpz_blank_col"], np.float32)
        lpz = np.zeros((len(col), 8), np.float32)
        lpz[:, 0] = col
        blank = find_blank_lpz(lpz, case["nsamples"], 0, 0.98)
        assert (int(blank.start), int(blank.end)) == (case["start"], case["end"]), case


def test_espnet_split_text_matches_reference(monkeypatch):
    import numpy as np

    from reazonspeech_tpu.espnet.asr import ctc as espnet_ctc

    for case in FIXTURES["espnet_split_cases"]:
        timings = np.asarray(case["timings"])
        monkeypatch.setattr(
            espnet_ctc, "get_timings", lambda m, s, t, lpz_log=None, _ti=timings: _ti
        )
        out = espnet_ctc.split_text(None, np.zeros(10), case["text"])
        assert len(out) == len(case["segments"]), case
        for (a, b, txt), want in zip(out, case["segments"]):
            assert float(a) == pytest.approx(want[0], abs=1e-9)
            assert float(b) == pytest.approx(want[1], abs=1e-9)
            assert txt == want[2]


def test_v1_split_text_matches_reference(monkeypatch):
    import numpy as np

    import importlib

    # the v1 package re-exports a `transcribe` FUNCTION that shadows the
    # submodule attribute; fetch the module itself
    v1t = importlib.import_module("reazonspeech_tpu.v1.transcribe")

    for case in FIXTURES["v1_split_cases"]:
        timings = np.asarray(case["timings"], np.float32)
        monkeypatch.setattr(
            v1t, "_get_timings", lambda a, l, n, m, _ti=timings: _ti
        )
        out = v1t._split_text(
            case["text"],
            np.zeros(case["audio_len"], np.float32),
            None,
            lpz_log=np.zeros((4, 4), np.float32),
        )
        assert len(out) == len(case["segments"]), case
        for (a, b, txt), want in zip(out, case["segments"]):
            assert float(a) == pytest.approx(want[0], rel=1e-6)
            assert float(b) == pytest.approx(want[1], rel=1e-6)
            assert txt == want[2]


def test_eval_normalize_matches_reference():
    from reazonspeech_tpu.evaluation.utils import normalize

    for case in FIXTURES["normalize_cases"]:
        assert normalize(case["input"]) == case["output"], case
