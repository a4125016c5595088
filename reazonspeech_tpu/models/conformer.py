"""ESPnet-style Conformer encoder preset + CTC head.

First-party replacement for the ESPnet Conformer-Transducer (120M) the
reference drives through ``Speech2Text`` (pkg/espnet-asr/src/transcribe.py:27-32)
and its CTC softmax head (pkg/espnet-asr/src/ctc.py:12-27). The encoder
reuses the Conformer block implementation in fastconformer.py with
ESPnet's Conv2dSubsampling (4×, VALID) and layer-norm conv modules.

Token conventions follow ESPnet: ``blank_id == 0`` for the CTC head and the
last entry of ``token_list`` is ``<sos/eos>`` (the reference's alignment code
slices it off: pkg/espnet-asr/src/ctc.py:66).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .fastconformer import FastConformerConfig, fastconformer_encode, init_fastconformer
from .layers import dense, dense_init

__all__ = [
    "espnet_encoder_config",
    "init_ctc_head",
    "ctc_logits",
    "ctc_log_softmax",
    "ctc_softmax",
]


def espnet_encoder_config(**overrides) -> FastConformerConfig:
    """~120M-class ESPnet Conformer: 12 layers, d=512, kernel 31, 4× VALID
    conv subsampling, layer-norm conv modules."""
    cfg = dict(
        num_layers=12,
        d_model=512,
        num_heads=8,
        ff_expansion=4,
        conv_kernel=31,
        subsampling_factor=4,
        subsampling_channels=512,
        subsampling_style="conv2d",
        conv_norm="layer_norm",
        final_norm=True,  # ESPnet after_norm (normalize_before)
    )
    cfg.update(overrides)
    return FastConformerConfig(**cfg)


def init_ctc_head(key, d_model: int, num_tokens: int):
    """Linear d_model -> num_tokens (token 0 is the CTC blank)."""
    return {"out": dense_init(key, d_model, num_tokens)}


def ctc_logits(params, enc, dtype=jnp.float32):
    return dense(params["out"], enc, dtype=dtype).astype(jnp.float32)


def ctc_log_softmax(params, enc):
    return jax.nn.log_softmax(ctc_logits(params, enc), axis=-1)


def ctc_softmax(params, enc):
    """Per-frame token probabilities — the ``lpz`` matrix consumed by blank
    detection and CTC segmentation (pkg/espnet-asr/src/ctc.py:25-27)."""
    return jax.nn.softmax(ctc_logits(params, enc), axis=-1)
