"""End-to-end tests of the espnet-flavor API on a tiny random model."""

import numpy as np
import pytest

from reazonspeech_tpu.espnet.asr import (
    TranscribeConfig,
    audio_from_numpy,
    load_model,
    transcribe,
)
from reazonspeech_tpu.espnet.asr.ctc import (
    find_blank,
    find_end_of_segment,
    split_text,
)
from reazonspeech_tpu.models.conformer import espnet_encoder_config
from reazonspeech_tpu.models.rnnt import RNNTConfig
# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def tiny_model():
    enc_cfg = espnet_encoder_config(
        num_layers=2, d_model=64, num_heads=4, subsampling_channels=32,
        compute_dtype="float32",
    )
    return load_model(enc_cfg=enc_cfg, checkpoint="random")


def test_ctc_probs_shape(tiny_model):
    rng = np.random.default_rng(0)
    samples = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    lpz = tiny_model.ctc_probs(samples)
    # espnet conv2d subsampling: T = ((Tmel-1)//2 - 1)//2
    tmel = 32000 // 160 + 1
    t = ((tmel - 1) // 2 - 1) // 2
    assert lpz.shape == (t, len(tiny_model.token_list))
    np.testing.assert_allclose(lpz.sum(axis=-1), 1.0, atol=1e-4)


def test_find_blank_on_model(tiny_model):
    rng = np.random.default_rng(0)
    samples = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    b = find_blank(tiny_model, samples)
    assert 0 <= b.start <= b.end <= 16000


def test_find_end_of_segment_espnet():
    text = "あいうえおかきくけこさしすせそた、ちつ"
    timings = np.arange(len(text)) * 100.0
    # comma at idx 16 with >=15 chars -> break at 16
    assert find_end_of_segment(text, timings, 0) == 16


def test_find_end_of_segment_phonemic_break_samples():
    text = "あいうえおかきくけこさしすせそたち"
    timings = np.arange(len(text)) * 100.0
    timings[16] = timings[15] + 9000  # gap > 8000 samples before last char
    assert find_end_of_segment(text, timings, 0) == 15


def test_split_text_fallback_on_unknown_chars(tiny_model):
    samples = np.zeros(8000, np.float32)
    # chars not in the vocabulary -> alignment raises -> whole-audio fallback
    out = split_text(tiny_model, samples, "ABC💥")
    assert out == [(0, 8000, "ABC💥")]


def test_transcribe_short(tiny_model):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(24000) * 0.1).astype(np.float32)
    ret = transcribe(tiny_model, audio_from_numpy(wav, 16000), TranscribeConfig(verbose=False))
    assert isinstance(ret.text, str)
    assert "".join(s.text for s in ret.segments) == ret.text
    for seg in ret.segments:
        assert 0 <= seg.start_seconds <= seg.end_seconds <= 1.5 + 1e-6


def test_transcribe_long_form_chunks(tiny_model):
    """>20 s input must go through the blank-cut windowing loop and still
    cover the whole waveform."""
    rng = np.random.default_rng(1)
    seconds = 45
    wav = (rng.standard_normal(seconds * 16000) * 0.1).astype(np.float32)
    # carve silence holes so find_blank has something to find
    wav[15 * 16000 : 17 * 16000] = 0
    wav[33 * 16000 : 34 * 16000] = 0
    ret = transcribe(tiny_model, audio_from_numpy(wav, 16000), TranscribeConfig(verbose=False))
    assert isinstance(ret.text, str)
    for seg in ret.segments:
        assert 0 <= seg.start_seconds <= seg.end_seconds <= seconds + 1e-6


def test_transcribe_resamples(tiny_model):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(22050) * 0.1).astype(np.float32)
    ret = transcribe(
        tiny_model, audio_from_numpy(wav, 22050), TranscribeConfig(verbose=False)
    )
    assert isinstance(ret.text, str)


def test_beam_saturation_warns(tiny_model):
    """When the fixed-shape pop budget ends a frame before ESPnet's own
    termination test, serving must say so instead of silently returning a
    potentially-divergent result."""
    from dataclasses import replace as _replace

    from reazonspeech_tpu.decoding.transducer_graves import GravesBeamConfig

    # 4 pops/frame can never satisfy "8 kept outscore all pending", so every
    # frame exits through the cap with the saturated flag set
    saturating = _replace(
        tiny_model,
        decode_cfg=GravesBeamConfig(
            beam_size=8, max_pops_per_frame=4, kept_capacity=4
        ),
    )
    rng = np.random.default_rng(1)
    wav = np.zeros((1, 16000), np.float32)
    wav[0] = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    with pytest.warns(RuntimeWarning, match="pop budget"):
        saturating.decode_batch(wav, np.array([16000], np.int32))


def test_transcribe_maes_decoding():
    """decoding="maes" drives the full transcribe path end-to-end (the
    alignment-synchronous opt-in; algorithm gated in test_maes_beam.py)."""
    enc_cfg = espnet_encoder_config(
        num_layers=2, d_model=64, num_heads=4, subsampling_channels=32,
        compute_dtype="float32",
    )
    model = load_model(enc_cfg=enc_cfg, checkpoint="random", decoding="maes")
    from reazonspeech_tpu.decoding.transducer_maes import MAESBeamConfig

    assert isinstance(model.decode_cfg, MAESBeamConfig)
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(24000) * 0.1).astype(np.float32)
    ret = transcribe(model, audio_from_numpy(wav, 16000),
                     TranscribeConfig(verbose=False))
    assert isinstance(ret.text, str)
    assert "".join(s.text for s in ret.segments) == ret.text
