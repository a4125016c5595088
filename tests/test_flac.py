"""First-party FLAC (verbatim) encode/decode tests."""

import numpy as np
import pytest

from reazonspeech_tpu.core.flac import decode_flac, encode_flac


def test_roundtrip_mono():
    rng = np.random.default_rng(0)
    pcm = rng.integers(-32768, 32768, 10000).astype(np.int16)
    data = encode_flac(pcm, 16000)
    assert data[:4] == b"fLaC"
    out, sr = decode_flac(data)
    assert sr == 16000
    np.testing.assert_array_equal(out, pcm)


def test_roundtrip_float_input():
    t = np.arange(5000) / 16000
    wav = (np.sin(2 * np.pi * 440 * t) * 0.5).astype(np.float32)
    out, sr = decode_flac(encode_flac(wav, 16000))
    np.testing.assert_allclose(out / 32768.0, wav, atol=1.0 / 32768)


def test_roundtrip_stereo():
    rng = np.random.default_rng(1)
    pcm = rng.integers(-32768, 32768, (5000, 2)).astype(np.int16)
    out, sr = decode_flac(encode_flac(pcm, 48000))
    assert sr == 48000
    np.testing.assert_array_equal(out, pcm)


def test_multiple_blocks():
    # > one 4096-sample block, non-multiple tail
    pcm = np.arange(-5000, 5000, dtype=np.int16)
    out, _ = decode_flac(encode_flac(pcm, 16000))
    np.testing.assert_array_equal(out, pcm)


def test_streaminfo_fields():
    pcm = np.zeros(100, np.int16)
    data = encode_flac(pcm, 22050)
    # STREAMINFO: header byte 0x80 (last block, type 0), length 34
    assert data[4] == 0x80
    assert int.from_bytes(data[5:8], "big") == 34
    out, sr = decode_flac(data)
    assert sr == 22050 and len(out) == 100


def test_md5_embedded():
    import hashlib

    pcm = np.arange(100, dtype=np.int16)
    data = encode_flac(pcm, 16000)
    md5 = hashlib.md5(pcm.astype("<i2").tobytes()).digest()
    assert md5 in data[:50]


def test_not_flac():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFFxxxx")


def test_corpus_zip_flac_roundtrip(tmp_path):
    """save_as_zip default (FLAC) entries decode back via audio_from_path."""
    import zipfile

    from reazonspeech_tpu.core.audio import audio_from_path
    from reazonspeech_tpu.oneseg import Utterance, save_as_zip

    rng = np.random.default_rng(2)
    wav = (rng.standard_normal(3200) * 0.1).astype(np.float32)
    utt = Utterance(
        buffer=wav, samplerate=16000, duration=0.2, start_seconds=0,
        end_seconds=0.2, text="テスト", ctc=-0.1,
    )
    p = tmp_path / "c.zip"
    save_as_zip([utt], str(p))  # default format="flac"
    with zipfile.ZipFile(p) as z:
        assert "0000.flac" in z.namelist()
        raw = z.read("0000.flac")
    f = tmp_path / "x.flac"
    f.write_bytes(raw)
    a = audio_from_path(f)
    assert a.samplerate == 16000
    np.testing.assert_allclose(a.waveform, wav, atol=1.5 / 32768)
