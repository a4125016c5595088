import io
import json

import pytest

from reazonspeech_tpu.core.interface import Segment
from reazonspeech_tpu.core.writers import (
    ASSWriter,
    JSONWriter,
    SRTWriter,
    TSVWriter,
    TextWriter,
    VTTWriter,
    get_writer,
)

SEGMENTS = [
    Segment(0.0, 1.5, "こんにちは。"),
    Segment(3661.25, 3662.875, "テストです。"),
]


def render(cls):
    fp = io.StringIO()
    w = cls(fp)
    w.write_header()
    for seg in SEGMENTS:
        w.write(seg)
    return fp.getvalue()


def test_vtt():
    out = render(VTTWriter)
    assert out.startswith("WEBVTT\n\n")
    assert "00:00:00.000 --> 00:00:01.500\nこんにちは。\n\n" in out
    assert "01:01:01.250 --> 01:01:02.875\nテストです。\n\n" in out


def test_srt():
    out = render(SRTWriter)
    assert "1\n00:00:00,000 --> 00:00:01,500\nこんにちは。\n\n" in out
    assert "2\n01:01:01,250 --> 01:01:02,875\nテストです。\n\n" in out


def test_ass():
    out = render(ASSWriter)
    assert "[Script Info]" in out
    assert "ScriptType: v4.00+" in out
    assert "[V4+ Styles]" in out
    assert "Dialogue: 0,0:00:00.00,0:00:01.50,Default,,0,0,0,,こんにちは。\n" in out
    assert "Dialogue: 0,1:01:01.25,1:01:02.87,Default,,0,0,0,,テストです。\n" in out


def test_json():
    out = render(JSONWriter)
    lines = [json.loads(x) for x in out.strip().split("\n")]
    assert lines[0] == {"start_seconds": 0.0, "end_seconds": 1.5, "text": "こんにちは。"}
    assert lines[1]["start_seconds"] == 3661.25
    # ensure_ascii must be off: raw Japanese in the output
    assert "こんにちは。" in out


def test_tsv():
    out = render(TSVWriter)
    assert out.startswith("start_seconds\tend_seconds\ttext\n")
    assert "0.000\t1.500\tこんにちは。\n" in out
    assert "3661.250\t3662.875\tテストです。\n" in out


def test_text():
    out = render(TextWriter)
    assert "[00:00:00.000 --> 00:00:01.500] こんにちは。\n" in out


@pytest.mark.parametrize(
    "ext,cls",
    [
        ("vtt", VTTWriter),
        (".vtt", VTTWriter),
        ("srt", SRTWriter),
        ("ass", ASSWriter),
        ("json", JSONWriter),
        ("tsv", TSVWriter),
        ("txt", TextWriter),
        ("bogus", TextWriter),
    ],
)
def test_get_writer_by_ext(ext, cls):
    assert isinstance(get_writer(io.StringIO(), ext), cls)


def test_get_writer_from_filename(tmp_path):
    # Unlike the reference (whose splitext keeps the dot and silently falls
    # back to TextWriter), the extension is derived correctly from the name.
    p = tmp_path / "out.vtt"
    with open(p, "w") as fp:
        assert isinstance(get_writer(fp), VTTWriter)


def test_get_writer_no_name():
    assert isinstance(get_writer(io.StringIO()), TextWriter)
