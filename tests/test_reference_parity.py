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
