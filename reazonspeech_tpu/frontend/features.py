"""On-device log-mel feature extraction (JAX, MXU-friendly).

Replaces the reference's three external native frontends (SURVEY.md §2.2):
NeMo's mel preprocessor (nemo-asr), kaldi-native-fbank (k2-asr via
sherpa-onnx, pkg/k2-asr/src/huggingface.py:79-80: 16 kHz / 80-dim), and
ESPnet's STFT frontend (espnet-asr).

TPU-first design notes:
- The DFT is expressed as two real matmuls against precomputed cos/sin bases
  instead of an FFT: for n_fft ≤ 512 this keeps the whole frontend on the MXU
  and lets XLA fuse window/power/mel/log into the surrounding program. The
  mel projection folds INTO the DFT bases offline (cos_basis @ melᵀ) whenever
  mag_power == 2 is not required first — here power is needed, so mel stays a
  separate [n_bins, n_mels] matmul.
- Everything is static-shape: the frame count is a function of the (padded)
  waveform length; per-utterance valid lengths flow alongside as an int32
  vector and drive masked normalization.
- fp32 throughout: the frontend is <1% of total FLOPs, and fp32 here protects
  the 0.08 s timestamp grid that decode-side heuristics depend on
  (pkg/nemo-asr/src/decode.py:48).
"""

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .mel import mel_filterbank

__all__ = [
    "FrontendConfig",
    "nemo_frontend_config",
    "kaldi_frontend_config",
    "espnet_frontend_config",
    "log_mel_spectrogram",
    "num_frames",
]


@dataclass(frozen=True)
class FrontendConfig:
    sample_rate: int = 16000
    n_fft: int = 512
    win_length: int = 400
    hop_length: int = 160
    n_mels: int = 80
    # preemphasis: "global" (x[t]-k·x[t-1] over the utterance, NeMo) or
    # "frame" (within each frame, Kaldi) or None
    preemph: Optional[float] = 0.97
    preemph_mode: str = "global"
    window: str = "hann"  # hann | hann_periodic | povey | hamming | none
    # framing: "center" (reflect-pad n_fft//2 both sides, torch.stft style) or
    # "kaldi" (snip_edges=False: centers at t·hop + hop/2, reflect at edges)
    framing: str = "center"
    remove_dc: bool = False
    mag_power: float = 2.0
    mel_scale: str = "slaney"
    mel_norm: Optional[str] = "slaney"
    mel_triangle_domain: str = "hz"
    fmin: float = 0.0
    fmax: Optional[float] = None
    log_zero_guard: float = 2.0**-24
    log_zero_guard_type: str = "add"  # add | clamp
    normalize: Optional[str] = "per_feature"  # per_feature | per_utterance | None
    normalize_eps: float = 1e-5


def nemo_frontend_config(**overrides) -> FrontendConfig:
    """NeMo AudioToMelSpectrogramPreprocessor semantics (FastConformer):
    global preemph 0.97, symmetric hann, centered reflect-pad STFT, power 2,
    slaney/slaney mel, log(x + 2^-24), per-feature normalization."""
    return FrontendConfig(**overrides)


def kaldi_frontend_config(**overrides) -> FrontendConfig:
    """kaldi-native-fbank semantics as configured by sherpa for the k2 models:
    per-frame DC removal + preemph, povey window, snip_edges=False framing,
    HTK mel triangles computed in mel space, no norm, log with float-eps clamp,
    no feature normalization."""
    cfg = dict(
        preemph=0.97,
        preemph_mode="frame",
        window="povey",
        framing="kaldi",
        remove_dc=True,
        mel_scale="htk",
        mel_norm=None,
        mel_triangle_domain="mel",
        fmin=20.0,
        log_zero_guard=float(np.finfo(np.float32).eps),
        log_zero_guard_type="clamp",
        normalize=None,
    )
    cfg.update(overrides)
    return FrontendConfig(**cfg)


def espnet_frontend_config(**overrides) -> FrontendConfig:
    """ESPnet default frontend: no preemph, periodic hann, centered STFT,
    librosa mel (slaney/slaney), log with 1e-10 clamp; normalization is done
    by a separate GlobalMVN layer, not here."""
    cfg = dict(
        preemph=None,
        window="hann_periodic",
        log_zero_guard=1e-10,
        log_zero_guard_type="clamp",
        normalize=None,
    )
    cfg.update(overrides)
    return FrontendConfig(**cfg)


def _make_window(cfg: FrontendConfig) -> np.ndarray:
    n = cfg.win_length
    if cfg.window == "none":
        return np.ones(n, np.float64)
    if cfg.window == "hann":
        return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))
    if cfg.window == "hann_periodic":
        return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)
    if cfg.window == "hamming":
        return 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(n) / (n - 1))
    if cfg.window == "povey":
        hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))
        return hann**0.85
    raise ValueError(f"unknown window: {cfg.window}")


@functools.lru_cache(maxsize=16)
def _constants(cfg: FrontendConfig):
    """Precompute window, DFT bases, and mel matrix for a config (host)."""
    window = _make_window(cfg)
    n_bins = cfg.n_fft // 2 + 1
    # Real DFT bases over the zero-padded frame: [win_length, n_bins].
    # Frames are windowed then zero-padded to n_fft (same as torch.stft with
    # win_length < n_fft, which center-pads the window; we left-align padding
    # inside the frame slot consistently with how the frame is extracted).
    t = np.arange(cfg.n_fft)
    k = np.arange(n_bins)
    ang = 2.0 * np.pi * np.outer(t, k) / cfg.n_fft
    cos_b = np.cos(ang)
    sin_b = -np.sin(ang)
    # torch.stft centers a short window inside the n_fft frame:
    pad_left = (cfg.n_fft - cfg.win_length) // 2
    wcos = np.zeros((cfg.win_length, n_bins))
    wsin = np.zeros((cfg.win_length, n_bins))
    wcos[:, :] = cos_b[pad_left : pad_left + cfg.win_length] * window[:, None]
    wsin[:, :] = sin_b[pad_left : pad_left + cfg.win_length] * window[:, None]
    mel = mel_filterbank(
        cfg.n_mels,
        cfg.n_fft,
        cfg.sample_rate,
        fmin=cfg.fmin,
        fmax=cfg.fmax,
        scale=cfg.mel_scale,
        norm=cfg.mel_norm,
        triangle_domain=cfg.mel_triangle_domain,
    )
    # NOTE: return numpy, not jnp — this function is lru_cached and jnp
    # constants created inside a jit trace must never outlive the trace.
    return (
        np.asarray(wcos, np.float32),
        np.asarray(wsin, np.float32),
        np.asarray(mel.T, np.float32),  # [n_bins, n_mels]
    )


def num_frames(cfg: FrontendConfig, n_samples: int):
    """Frame count for a waveform of n_samples (python int or traced int)."""
    if cfg.framing == "center":
        return n_samples // cfg.hop_length + 1
    if cfg.framing == "kaldi":
        return (n_samples + cfg.hop_length // 2) // cfg.hop_length
    raise ValueError(cfg.framing)


def _pad_for_framing(x, cfg: FrontendConfig):
    """Apply the config's padding convention. Returns (padded, first, t_out):
    frame t covers padded[first + t·hop : first + t·hop + win]."""
    hop, win = cfg.hop_length, cfg.win_length
    n = x.shape[-1]
    if cfg.framing == "center":
        t_out = n // hop + 1
        pad = cfg.n_fft // 2
        # torch.stft(center=True) reflect-pads n_fft//2; the window is then
        # centered in the n_fft slot, so the first sample touched by the
        # window is pad_left into the padded signal.
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        first = (cfg.n_fft - win) // 2
    elif cfg.framing == "kaldi":
        t_out = (n + hop // 2) // hop
        # frame t covers [t*hop + hop/2 - win/2, ... + win); pad enough on
        # both sides. Kaldi's ExtractWindow maps an out-of-range sample s to
        # -s-1 (left) / 2n-1-s (right), i.e. SYMMETRIC padding — the edge
        # sample is duplicated (feature-window.cc semantics; "reflect" would
        # skip it and shift every edge frame by one sample).
        left = max(0, (win - hop) // 2 + 1)
        right = win + hop
        x = jnp.pad(x, ((0, 0), (left, right)), mode="symmetric")
        first = left + hop // 2 - win // 2
    else:
        raise ValueError(cfg.framing)
    return x, first, t_out


def _frame_signal(x, cfg: FrontendConfig):
    """[B, N] -> [B, T, win_length]: framing as an XLA patches op (a strided
    im2col the TPU backend lowers natively — a plain gather here costs two
    orders of magnitude more)."""
    hop, win = cfg.hop_length, cfg.win_length
    x, first, t_out = _pad_for_framing(x, cfg)
    usable = first + (t_out - 1) * hop + win
    x = x[:, first:usable]
    patches = jax.lax.conv_general_dilated_patches(
        x[:, None, :],  # [B, C=1, L]
        filter_shape=(win,),
        window_strides=(hop,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [B, win, T]
    return jnp.transpose(patches, (0, 2, 1)), t_out


def _dft_blockmm(x, cfg: FrontendConfig, wcos, wsin):
    """Fused framing+window+DFT as ceil(win/hop) shifted DENSE matmuls over
    hop-sized signal blocks. After slicing at the first frame's start, frame
    t begins at t·hop, so reshaping to [B, nblocks, hop] makes frame t the
    concatenation of blocks t..t+nj-1 — each kernel row-slice contracts with
    a shifted VIEW of the block array. No im2col materialization and no
    strided-conv lowering: measured 57 -> 38 ms for the DFT stage at
    B=32×30 s on a v5e chip versus the conv_general_dilated formulation.
    Valid when no per-frame preprocessing (DC removal / per-frame preemph)
    is configured. Returns power spectrum [B, T, n_bins] fp32."""
    hop, win = cfg.hop_length, cfg.win_length
    x, first, t_out = _pad_for_framing(x, cfg)
    nj = -(-win // hop)  # blocks overlapping one frame
    need = first + (t_out - 1 + nj) * hop
    if x.shape[-1] < need:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[-1])))
    x = x[:, first:need]
    blocks = x.reshape(x.shape[0], -1, hop)  # [B, t_out+nj-1, hop]
    kernel = np.concatenate([wcos, wsin], axis=1)  # [win, 2K] (host consts)
    out = 0.0
    for j in range(nj):
        wj = jnp.asarray(kernel[j * hop : min((j + 1) * hop, win)])
        seg = blocks[:, j : j + t_out, : wj.shape[0]]
        out = out + jnp.einsum(
            "btw,wk->btk", seg, wj,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    re, im = jnp.split(out, 2, axis=-1)
    return re * re + im * im, t_out


def log_mel_spectrogram(waveform, lengths, cfg: FrontendConfig):
    """Compute log-mel features.

    Args:
      waveform: [B, N] float32 (16 kHz mono, already resampled)
      lengths: [B] int32 valid sample counts
      cfg: FrontendConfig

    Returns:
      (features [B, T, n_mels] float32, out_lengths [B] int32). Frames beyond
      out_lengths are zeroed.
    """
    waveform = waveform.astype(jnp.float32)
    wcos, wsin, mel = _constants(cfg)

    if cfg.preemph is not None and cfg.preemph_mode == "global":
        waveform = jnp.concatenate(
            [waveform[:, :1], waveform[:, 1:] - cfg.preemph * waveform[:, :-1]],
            axis=1,
        )

    # precision=HIGHEST throughout: the spectrum spans ~8 orders of magnitude
    # and feeds a log — TPU bf16 default matmul precision visibly corrupts
    # quiet bins.
    hi = jax.lax.Precision.HIGHEST
    per_frame_ops = cfg.remove_dc or (
        cfg.preemph is not None and cfg.preemph_mode == "frame"
    )
    if not per_frame_ops:
        # fast path: framing+window+DFT as shifted block matmuls (MXU)
        power, t_out = _dft_blockmm(waveform, cfg, wcos, wsin)
    else:
        frames, t_out = _frame_signal(waveform, cfg)  # [B, T, win]
        if cfg.remove_dc:
            frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
        if cfg.preemph is not None and cfg.preemph_mode == "frame":
            frames = jnp.concatenate(
                [
                    frames[..., :1] * (1.0 - cfg.preemph),
                    frames[..., 1:] - cfg.preemph * frames[..., :-1],
                ],
                axis=-1,
            )
        re = jnp.einsum(
            "btw,wk->btk", frames, wcos,
            precision=hi, preferred_element_type=jnp.float32,
        )
        im = jnp.einsum(
            "btw,wk->btk", frames, wsin,
            precision=hi, preferred_element_type=jnp.float32,
        )
        power = re * re + im * im
    if cfg.mag_power != 2.0:
        power = jnp.power(jnp.sqrt(jnp.maximum(power, 1e-20)), cfg.mag_power)

    feats = jnp.einsum(
        "btk,km->btm", power, mel,
        precision=hi, preferred_element_type=jnp.float32,
    )

    if cfg.log_zero_guard_type == "add":
        feats = jnp.log(feats + cfg.log_zero_guard)
    else:
        feats = jnp.log(jnp.maximum(feats, cfg.log_zero_guard))

    out_lengths = jnp.where(lengths > 0, num_frames(cfg, lengths), 0).astype(
        jnp.int32
    )
    mask = jnp.arange(t_out)[None, :] < out_lengths[:, None]  # [B, T]

    if cfg.normalize == "per_feature":
        m = mask[..., None]
        cnt = jnp.maximum(out_lengths[:, None].astype(jnp.float32), 2.0)
        mean = jnp.sum(jnp.where(m, feats, 0.0), axis=1) / cnt  # [B, n_mels]
        var = jnp.sum(
            jnp.where(m, (feats - mean[:, None, :]) ** 2, 0.0), axis=1
        ) / (cnt - 1.0)
        feats = (feats - mean[:, None, :]) / (jnp.sqrt(var)[:, None, :] + cfg.normalize_eps)
    elif cfg.normalize == "per_utterance":
        m = mask[..., None]
        cnt = jnp.maximum(
            out_lengths.astype(jnp.float32) * cfg.n_mels, 2.0
        )[:, None, None]
        mean = jnp.sum(jnp.where(m, feats, 0.0), axis=(1, 2), keepdims=True) / cnt
        var = jnp.sum(jnp.where(m, (feats - mean) ** 2, 0.0), axis=(1, 2), keepdims=True) / (
            cnt - 1.0
        )
        feats = (feats - mean) / (jnp.sqrt(var) + cfg.normalize_eps)

    feats = jnp.where(mask[..., None], feats, 0.0)
    return feats, out_lengths
