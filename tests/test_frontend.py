import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from reazonspeech_tpu.frontend.features import (
    FrontendConfig,
    espnet_frontend_config,
    kaldi_frontend_config,
    log_mel_spectrogram,
    nemo_frontend_config,
    num_frames,
)
from reazonspeech_tpu.frontend.mel import hz_to_mel, mel_filterbank, mel_to_hz
from reazonspeech_tpu.frontend.resample import resample

# the torch-side frontend oracles (independent implementations of the
# published frontends' semantics — NOT built from reazonspeech_tpu code)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def chirp(sr, seconds, f0=100.0, f1=3800.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    f = f0 + (f1 - f0) * t / t[-1]
    return (np.sin(2 * np.pi * np.cumsum(f) / sr) * 0.5).astype(np.float32) + (
        rng.standard_normal(len(t)).astype(np.float32) * 0.01
    )


# ---------------------------------------------------------------------------
# mel filterbank
# ---------------------------------------------------------------------------

def test_mel_scale_roundtrip():
    f = np.array([0.0, 300.0, 1000.0, 4000.0, 8000.0])
    for scale in ("slaney", "htk"):
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(f, scale), scale), f, atol=1e-6)


def test_mel_filterbank_shapes_and_coverage():
    fb = mel_filterbank(80, 512, 16000)
    assert fb.shape == (80, 257)
    # every filter has positive mass, and interior bins are covered
    assert (fb.sum(axis=1) > 0).all()
    coverage = fb.sum(axis=0)
    assert (coverage[5:-5] > 0).all()


def test_mel_filterbank_kaldi_style():
    fb = mel_filterbank(
        80, 512, 16000, fmin=20.0, scale="htk", norm=None, triangle_domain="mel"
    )
    assert fb.shape == (80, 257)
    # un-normalized triangles peak near 1
    assert 0.5 < fb.max() <= 1.0 + 1e-6


# ---------------------------------------------------------------------------
# STFT framing parity vs torch.stft (the semantics NeMo/ESPnet rely on)
# ---------------------------------------------------------------------------

def test_mel_filterbank_matches_independent_slaney():
    """Our numpy filterbank vs the oracle's torch derivation of librosa's
    slaney/slaney banks (tools/torch_reference.py — written from the
    published formula, not from frontend/mel.py). Closes the round-2
    circularity where the 'torch reference' borrowed our own filterbank."""
    from torch_reference import slaney_mel_banks

    ours = mel_filterbank(80, 512, 16000)
    theirs = slaney_mel_banks(80, 512, 16000).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-7)


def test_mel_filterbank_matches_independent_kaldi():
    from torch_reference import kaldi_mel_banks

    ours = mel_filterbank(
        80, 512, 16000, fmin=20.0, scale="htk", norm=None, triangle_domain="mel"
    )
    theirs = kaldi_mel_banks(80, 512, 16000).numpy()  # [80, 256] (no nyquist)
    np.testing.assert_allclose(ours[:, :256], theirs, atol=1e-6)
    # kaldi's banks stop before nyquist; ours must give it no weight beyond
    # the triangle tail (the power there is ~0 anyway)
    assert ours[:, 256].max() <= ours.max()


@pytest.mark.parametrize("preset,oracle_name", [
    ("nemo", "nemo_preprocessor_reference"),
    ("kaldi", "kaldi_fbank_reference"),
    ("espnet", "espnet_frontend_reference"),
])
def test_frontend_presets_match_torch_oracles(preset, oracle_name):
    """Full numeric parity of every frontend preset against its independent
    torch oracle (waveform in, features out) — replaces the round-2
    shape-only kaldi and framing-only espnet checks."""
    import torch

    import torch_reference as tr

    cfg = {
        "nemo": nemo_frontend_config,
        "kaldi": kaldi_frontend_config,
        "espnet": espnet_frontend_config,
    }[preset]()
    oracle = getattr(tr, oracle_name)
    for seconds, seed in ((1.0, 0), (0.53, 3)):
        x = chirp(16000, seconds, seed=seed)
        got, lens = log_mel_spectrogram(
            jnp.asarray(x)[None], jnp.array([len(x)]), cfg)
        with torch.no_grad():
            want = oracle(x, n_mels=cfg.n_mels).numpy()
        t = int(lens[0])
        assert t == want.shape[0]
        np.testing.assert_allclose(
            np.asarray(got[0, :t]), want, atol=2e-3, rtol=1e-3)


def test_frontend_padding_invariance():
    """Interior features of the valid region must not change when the batch
    is zero-padded. Only the last ~n_fft/2 samples' frames may differ (their
    centered-STFT context changes from reflected tail to zeros — the external
    reference frontends share this property), so normalization is disabled
    and edge frames are excluded."""
    cfg = nemo_frontend_config(normalize=None)
    x = chirp(16000, 0.7)
    alone, l1 = log_mel_spectrogram(jnp.asarray(x)[None], jnp.array([len(x)]), cfg)
    padded = np.zeros(16000, np.float32)
    padded[: len(x)] = x
    batched, l2 = log_mel_spectrogram(
        jnp.asarray(padded)[None], jnp.array([len(x)]), cfg
    )
    t = int(l1[0])
    assert int(l2[0]) == t
    edge = cfg.n_fft // 2 // cfg.hop_length + 1
    np.testing.assert_allclose(
        np.asarray(alone[0, : t - edge]),
        np.asarray(batched[0, : t - edge]),
        atol=1e-4,
    )
    # frames beyond the valid length are zeroed
    assert np.all(np.asarray(batched[0, t:]) == 0)


def test_kaldi_frontend_shapes():
    cfg = kaldi_frontend_config()
    x = chirp(16000, 0.5)
    feats, lens = log_mel_spectrogram(jnp.asarray(x)[None], jnp.array([len(x)]), cfg)
    # snip_edges=False frame count
    expect_t = (len(x) + 80) // 160
    assert int(lens[0]) == expect_t
    assert feats.shape == (1, expect_t, 80)
    assert np.isfinite(np.asarray(feats)).all()


def test_num_frames_traced_and_static_agree():
    cfg = nemo_frontend_config()
    assert num_frames(cfg, 16000) == 101
    assert int(num_frames(cfg, jnp.asarray(16000))) == 101


# ---------------------------------------------------------------------------
# resampler
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("orig_sr", [48000, 44100, 22050, 8000])
def test_resample_matches_scipy(orig_sr):
    from math import gcd

    from scipy.signal import resample_poly

    x = chirp(orig_sr, 0.5)
    got = np.asarray(resample(jnp.asarray(x), orig_sr, 16000))
    g = gcd(orig_sr, 16000)
    want = resample_poly(x.astype(np.float64), 16000 // g, orig_sr // g)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_resample_noop():
    x = chirp(16000, 0.1)
    out = resample(jnp.asarray(x), 16000, 16000)
    np.testing.assert_array_equal(np.asarray(out), x)


def test_resample_batched():
    x = np.stack([chirp(48000, 0.2), chirp(48000, 0.2, f0=200)]).astype(np.float32)
    out = np.asarray(resample(jnp.asarray(x), 48000, 16000))
    assert out.shape[0] == 2
    single = np.asarray(resample(jnp.asarray(x[1]), 48000, 16000))
    np.testing.assert_allclose(out[1], single, atol=1e-6)


def test_blockmm_dft_matches_naive_framing():
    """The shifted-block-matmul DFT must equal framing + einsum directly,
    for both hop|win (espnet 512/128) and hop∤win (nemo 400/160) geometries."""
    import jax
    import jax.numpy as jnp

    from reazonspeech_tpu.frontend import features as F

    rng = np.random.default_rng(11)
    for cfg in (F.nemo_frontend_config(), F.espnet_frontend_config()):
        x = jnp.asarray(rng.standard_normal((2, 16000), dtype=np.float32))
        wcos, wsin, _ = F._constants(cfg)
        got, t_out = F._dft_blockmm(x, cfg, wcos, wsin)
        frames, t2 = F._frame_signal(x, cfg)
        hi = jax.lax.Precision.HIGHEST
        re = jnp.einsum("btw,wk->btk", frames, wcos, precision=hi)
        im = jnp.einsum("btw,wk->btk", frames, wsin, precision=hi)
        want = re * re + im * im
        assert t_out == t2
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-4
        )
