"""v1 API tests: streaming transcribe generator, dynamic splitting, CLI."""

import io
import json

import numpy as np
import pytest

from reazonspeech_tpu.models.conformer import espnet_encoder_config
from reazonspeech_tpu.v1 import Caption, TranscribeConfig, transcribe
from reazonspeech_tpu.v1.transcribe import _split_text
# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def tiny_model():
    from reazonspeech_tpu.espnet.asr.model import load_model_container

    enc_cfg = espnet_encoder_config(
        num_layers=2, d_model=64, num_heads=4, subsampling_channels=32,
        compute_dtype="float32",
    )
    return load_model_container(checkpoint="random", enc_cfg=enc_cfg)


def test_transcribe_is_generator(tiny_model):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    gen = transcribe(wav, tiny_model)
    assert hasattr(gen, "__next__")
    caps = list(gen)
    for c in caps:
        assert isinstance(c, Caption)
        assert 0 <= c.start_seconds <= c.end_seconds <= 1.0 + 1e-6


def test_transcribe_long_windowed(tiny_model):
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(30 * 16000) * 0.1).astype(np.float32)
    wav[10 * 16000 : 12 * 16000] = 0
    cfg = TranscribeConfig(window=20 * 16000)
    caps = list(transcribe(wav, tiny_model, cfg))
    for c in caps:
        assert 0 <= c.start_seconds <= c.end_seconds <= 30.0 + 1e-6


def test_split_text_short_input(tiny_model):
    audio = np.zeros(4000, np.float32)
    assert _split_text("あ", audio, tiny_model) == [(0, 4000, "あ")]


def test_split_text_fallback(tiny_model):
    audio = np.zeros(4000, np.float32)
    out = _split_text("XYZ💥", audio, tiny_model)
    assert out == [(0, 4000, "XYZ💥")]


def test_cli_json_default(tiny_model, tmp_path, monkeypatch):
    import sys

    from reazonspeech_tpu.core.audio import audio_from_numpy, audio_to_file
    from reazonspeech_tpu.v1 import cli

    rng = np.random.default_rng(0)
    wav = tmp_path / "in.wav"
    audio_to_file(
        str(wav),
        audio_from_numpy((rng.standard_normal(8000) * 0.1).astype(np.float32), 16000),
    )
    out = tmp_path / "out.unknownext"
    monkeypatch.setattr(cli, "load_default_model", lambda: tiny_model)
    monkeypatch.setattr(sys, "argv", ["reazonspeech", "-o", str(out), str(wav)])
    assert cli.main() is None
    body = out.read_text().strip()
    if body:  # random model may emit nothing
        for line in body.split("\n"):
            rec = json.loads(line)
            assert set(rec) == {"start_seconds", "end_seconds", "text"}


def test_cli_vtt_by_extension(tiny_model, tmp_path, monkeypatch):
    import sys

    from reazonspeech_tpu.core.audio import audio_from_numpy, audio_to_file
    from reazonspeech_tpu.v1 import cli

    rng = np.random.default_rng(0)
    wav = tmp_path / "in.wav"
    audio_to_file(
        str(wav),
        audio_from_numpy((rng.standard_normal(8000) * 0.1).astype(np.float32), 16000),
    )
    out = tmp_path / "out.vtt"
    monkeypatch.setattr(cli, "load_default_model", lambda: tiny_model)
    monkeypatch.setattr(sys, "argv", ["reazonspeech", "-o", str(out), str(wav)])
    assert cli.main() is None
    assert out.read_text().startswith("WEBVTT")


def test_cli_unknown_format(tiny_model, monkeypatch, capsys):
    import sys

    from reazonspeech_tpu.v1 import cli

    monkeypatch.setattr(sys, "argv", ["reazonspeech", "--to=doc", "x.wav"])
    assert cli.main() == 1
    assert "unknown output format" in capsys.readouterr().err


def test_get_utterances_integration(tiny_model, tmp_path, monkeypatch):
    """Full corpus path: synthetic TS captions + synthetic audio + real
    aligner over the tiny model."""
    import sys

    sys.path.insert(0, "tests")
    from test_oneseg import build_stream

    from reazonspeech_tpu.oneseg import CTCSegmentationAligner, get_utterances
    from reazonspeech_tpu.oneseg import align as align_mod

    text1 = "こんにちは。"
    stream = build_stream([(1.0, text1.encode("euc-jp")), (4.0, "はい。".encode("euc-jp"))])
    p = tmp_path / "t.m2ts"
    p.write_bytes(stream)

    rng = np.random.default_rng(0)
    fake_audio = (rng.standard_normal(8 * 16000) * 0.1).astype(np.float32)
    monkeypatch.setattr(align_mod, "load_audio", lambda path, sr: fake_audio)

    aligner = CTCSegmentationAligner(tiny_model)
    utts = get_utterances(str(p), aligner, speech2text=tiny_model, strategy="lax")
    # random model: alignment may or may not succeed; check structure of any
    for u in utts:
        assert u.samplerate == 16000
        assert u.duration == pytest.approx(u.end_seconds - u.start_seconds)
        assert u.buffer is not None
        assert u.asr is not None and u.cer is not None
