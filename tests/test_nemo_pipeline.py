"""End-to-end tests of the nemo-flavor public API on a tiny random model."""

import io

import numpy as np
import pytest

from reazonspeech_tpu.core.interface import Segment, Subword
from reazonspeech_tpu.decoding.rnnt_greedy import GreedyDecodeConfig
from reazonspeech_tpu.models.fastconformer import FastConformerConfig
from reazonspeech_tpu.models.rnnt import RNNTConfig
from reazonspeech_tpu.nemo.asr import (
    TranscribeConfig,
    audio_from_numpy,
    load_model,
    transcribe,
)
from reazonspeech_tpu.nemo.asr.decode import (
    PAD_SECONDS,
    SECONDS_PER_STEP,
    Hypothesis,
    decode_hypothesis,
    find_end_of_segment,
)


@pytest.fixture(scope="module")
def tiny_model():
    enc_cfg = FastConformerConfig.tiny(compute_dtype="float32")
    rnnt_cfg = RNNTConfig.tiny(enc_dim=enc_cfg.d_model, compute_dtype="float32")
    return load_model(enc_cfg=enc_cfg, rnnt_cfg=rnnt_cfg, checkpoint="random")


class FakeTok:
    """ids_to_text stand-in: id -> fixed char table."""

    def __init__(self, table):
        self.table = table

    def ids_to_text(self, ids):
        return "".join(self.table[i] for i in ids)


class FakeModel:
    def __init__(self, table):
        self.tokenizer = FakeTok(table)


def test_decode_hypothesis_timestamps():
    """Reference formula parity: seconds = 0.08*(step-idx-1) - 0.5, clamped
    at 0, where our Hypothesis encodes step = frame + idx + 1."""
    table = {0: "あ", 1: "い", 2: "う", 99: ""}
    model = FakeModel(table)
    # tokens at encoder frames 5, 6, 30
    hyp = Hypothesis.from_greedy([0, 1, 2], [5, 6, 30], blank_id=99)
    ret = decode_hypothesis(model, hyp)
    assert ret.text == "あいう"
    assert [s.token for s in ret.subwords] == ["あ", "い", "う"]
    expect = [max(0.08 * f - 0.5, 0) for f in (5, 6, 30)]
    got = [s.seconds for s in ret.subwords]
    np.testing.assert_allclose(got, expect, atol=1e-9)


def test_decode_hypothesis_trims_empty_tokens():
    table = {0: "あ", 1: "", 2: "う", 99: ""}
    model = FakeModel(table)
    hyp = Hypothesis.from_greedy([0, 1, 2], [5, 6, 7], blank_id=99)
    ret = decode_hypothesis(model, hyp)
    assert [s.token for s in ret.subwords] == ["あ", "う"]
    # text still includes all ids joined (tokenizer-level decision)
    assert ret.text == "あう"


def mk_subwords(spec):
    """spec: list of (token, seconds)."""
    return [Subword(seconds=s, token_id=0, token=t) for t, s in spec]


def test_find_end_of_segment_eos():
    sw = mk_subwords([("あ", 0.0), ("。", 0.1), ("い", 0.2), ("う", 0.3)])
    # EOS at idx 1 followed by non-punct -> break at idx 1
    assert find_end_of_segment(sw, 0) == 1


def test_find_end_of_segment_eos_followed_by_punct():
    sw = mk_subwords([("あ", 0.0), ("。", 0.1), ("。", 0.2), ("い", 0.3)])
    # '。' followed by another punct may not break at idx 1; breaks at idx 2
    assert find_end_of_segment(sw, 0) == 2


def test_find_end_of_segment_comma_after_min_length():
    spec = [(c, i * 0.05) for i, c in enumerate("あいうえおかきくけこさ")]
    spec += [("、", 0.6), ("し", 0.65), ("す", 0.7)]
    sw = mk_subwords(spec)
    # comma at idx 11 with idx-start >= 10 -> break there
    assert find_end_of_segment(sw, 0) == 11


def test_find_end_of_segment_phonemic_break():
    spec = [(c, i * 0.05) for i, c in enumerate("あいうえおかきくけこさし")]
    spec += [("す", 5.0)]  # big gap before す
    sw = mk_subwords(spec)
    idx = find_end_of_segment(sw, 0)
    assert idx == 11  # breaks right before the long pause


def test_segments_assembled():
    table = dict(enumerate("あいうえおかきくけこさしすせそ。"))
    table[99] = ""
    model = FakeModel(table)
    ids = list(range(12)) + [15]  # ...し then 。
    frames = list(range(8, 8 + 13))
    hyp = Hypothesis.from_greedy(ids, frames, blank_id=99)
    ret = decode_hypothesis(model, hyp)
    assert len(ret.segments) >= 1
    assert "".join(s.text for s in ret.segments) == ret.text
    for seg in ret.segments:
        assert seg.end_seconds > seg.start_seconds


def test_transcribe_end_to_end(tiny_model):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    audio = audio_from_numpy(wav, 16000)
    ret = transcribe(tiny_model, audio)
    assert isinstance(ret.text, str)
    # random model may or may not emit tokens, but structures must be sound
    for sw in ret.subwords:
        assert sw.seconds >= 0
    for seg in ret.segments:
        assert seg.end_seconds > seg.start_seconds
    assert ret.hypothesis is None

    ret2 = transcribe(tiny_model, audio, TranscribeConfig(raw_hypothesis=True))
    assert ret2.hypothesis is not None
    assert ret2.text == ret.text


def test_transcribe_resamples(tiny_model):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(44100) * 0.1).astype(np.float32)
    ret = transcribe(tiny_model, audio_from_numpy(wav, 44100))
    assert isinstance(ret.text, str)


def test_cli_runs(tiny_model, tmp_path, monkeypatch, capsys):
    """Drive the CLI main() with a tiny model patched in."""
    import sys

    from reazonspeech_tpu.core.audio import audio_to_file
    from reazonspeech_tpu.nemo.asr import cli

    wav = tmp_path / "in.wav"
    rng = np.random.default_rng(0)
    audio_to_file(
        str(wav),
        audio_from_numpy((rng.standard_normal(8000) * 0.1).astype(np.float32), 16000),
    )
    out = tmp_path / "out.vtt"
    monkeypatch.setattr(cli, "load_model", lambda: tiny_model)
    monkeypatch.setattr(
        sys, "argv", ["reazonspeech-nemo-asr", "--to=vtt", "-o", str(out), str(wav)]
    )
    assert cli.main() is None
    assert out.read_text().startswith("WEBVTT")


def test_transcribe_chunked_long_form(tiny_model):
    """chunk_seconds splits long audio into an overlapped batch; timestamps
    stay on the global grid and monotone."""
    rng = np.random.default_rng(5)
    wav = (rng.standard_normal(50 * 16000) * 0.1).astype(np.float32)
    audio = audio_from_numpy(wav, 16000)
    cfg = TranscribeConfig(chunk_seconds=20.0, chunk_overlap_seconds=4.0)
    ret = transcribe(tiny_model, audio, cfg)
    assert isinstance(ret.text, str)
    secs = [s.seconds for s in ret.subwords]
    assert secs == sorted(secs)
    for s in secs:
        assert 0 <= s <= 50.5
    # also compare against the unchunked path structurally
    ret_full = transcribe(tiny_model, audio)
    assert isinstance(ret_full.text, str)


def test_transcribe_chunked_matches_unchunked_on_short(tiny_model):
    """Audio below the threshold must take the identical single-pass path."""
    rng = np.random.default_rng(6)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    audio = audio_from_numpy(wav, 16000)
    r1 = transcribe(tiny_model, audio)
    r2 = transcribe(tiny_model, audio, TranscribeConfig(chunk_seconds=30.0))
    assert r1.text == r2.text
    assert [s.seconds for s in r1.subwords] == [s.seconds for s in r2.subwords]
