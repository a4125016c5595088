import io

import numpy as np
import pytest

from reazonspeech_tpu.core.audio import (
    SAMPLERATE,
    audio_from_numpy,
    audio_from_path,
    audio_to_file,
    norm_audio,
    pad_audio,
)


def sine(sr, seconds, freq=440.0):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32) * 0.5


def test_roundtrip_wav(tmp_path):
    x = sine(16000, 0.25)
    p = tmp_path / "test.wav"
    audio_to_file(str(p), audio_from_numpy(x, 16000))
    audio = audio_from_path(p)
    assert audio.samplerate == 16000
    assert audio.waveform.dtype == np.float32
    assert audio.waveform.shape == x.shape
    np.testing.assert_allclose(audio.waveform, x, atol=1e-4)


def test_roundtrip_stereo_downmix(tmp_path):
    x = np.stack([sine(8000, 0.1), -sine(8000, 0.1)])
    p = tmp_path / "stereo.wav"
    audio_to_file(str(p), audio_from_numpy(x, 8000))
    audio = audio_from_path(p)
    assert audio.samplerate == 8000
    assert audio.waveform.ndim == 1
    np.testing.assert_allclose(audio.waveform, np.zeros_like(audio.waveform), atol=1e-4)


def test_wav_filelike(tmp_path):
    x = sine(16000, 0.1)
    buf = io.BytesIO()
    audio_to_file(buf, audio_from_numpy(x, 16000))
    p = tmp_path / "f.wav"
    p.write_bytes(buf.getvalue())
    audio = audio_from_path(p)
    np.testing.assert_allclose(audio.waveform, x, atol=1e-4)


def test_norm_audio_resamples():
    x = sine(48000, 0.5)
    out = norm_audio(audio_from_numpy(x, 48000))
    assert out.samplerate == SAMPLERATE
    assert abs(len(out.waveform) - 8000) <= 2
    # Energy should be roughly preserved for a 440 Hz tone
    assert np.std(out.waveform) == pytest.approx(np.std(x), rel=0.05)


def test_norm_audio_mono_downmix():
    x = np.stack([sine(16000, 0.1), sine(16000, 0.1)])
    out = norm_audio(audio_from_numpy(x, 16000))
    assert out.waveform.ndim == 1
    np.testing.assert_allclose(out.waveform, x[0], atol=1e-6)


def test_norm_audio_noop_at_16k():
    x = sine(16000, 0.1)
    out = norm_audio(audio_from_numpy(x, 16000))
    np.testing.assert_array_equal(out.waveform, x)


def test_pad_audio():
    x = sine(16000, 0.1)
    out = pad_audio(audio_from_numpy(x, 16000), 0.5)
    assert len(out.waveform) == len(x) + 2 * 8000
    assert np.all(out.waveform[:8000] == 0)
    assert np.all(out.waveform[-8000:] == 0)


def test_not_a_wav(tmp_path):
    p = tmp_path / "x.mp3"
    p.write_bytes(b"\xff\xfb\x90\x00" + b"\x00" * 100)
    with pytest.raises(ValueError):
        audio_from_path(p)
