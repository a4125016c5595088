"""On-device polyphase resampling (JAX).

Replaces librosa/soxr (C) used by the reference's norm_audio
(pkg/nemo-asr/src/audio.py:54-68). Implemented as a zero-stuffed FIR low-pass
expressed with lax.conv_general_dilated (lhs_dilation = upsampling factor,
stride = downsampling factor), which XLA lowers to MXU-friendly convolution.

The FIR design matches scipy.signal.resample_poly's default (Kaiser β=5.0,
10·max(up,down) taps per side) so the host path in core.audio.norm_audio and
this device path produce near-identical waveforms.
"""

import functools
from math import gcd

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sps

__all__ = ["resample", "resample_ratio"]


def resample_ratio(orig_sr: int, target_sr: int):
    g = gcd(int(orig_sr), int(target_sr))
    return target_sr // g, orig_sr // g


@functools.lru_cache(maxsize=32)
def _fir_taps(up: int, down: int):
    max_rate = max(up, down)
    f_c = 1.0 / max_rate  # cutoff in Nyquist units
    half_len = 10 * max_rate
    taps = sps.firwin(2 * half_len + 1, f_c, window=("kaiser", 5.0)) * up
    return np.asarray(taps, np.float32), half_len


def resample(x, orig_sr: int, target_sr: int):
    """Resample [B, N] (or [N]) float32 waveforms.

    Output length is ceil(N * up / down), matching scipy.resample_poly.
    """
    if orig_sr == target_sr:
        return x
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    up, down = resample_ratio(orig_sr, target_sr)
    taps, half_len = _fir_taps(up, down)
    n_in = x.shape[-1]
    n_out = -(-n_in * up // down)

    # scipy zero-pads the input so the filter's group delay (half_len taps at
    # the upsampled rate) is removed and output sample k corresponds to input
    # time k*down/up.
    kernel = jnp.asarray(taps)[None, None, :]  # [out_ch, in_ch, W]
    lhs = x[:, None, :]  # [B, 1, N]
    out = jax.lax.conv_general_dilated(
        lhs,
        kernel,
        window_strides=(down,),
        padding=[(half_len, half_len + down * (n_out - 1) - n_in * up + up)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :n_out]
    if squeeze:
        out = out[0]
    return out
