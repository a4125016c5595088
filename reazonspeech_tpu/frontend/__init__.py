from .features import (
    FrontendConfig,
    kaldi_frontend_config,
    log_mel_spectrogram,
    nemo_frontend_config,
    espnet_frontend_config,
)
from .resample import resample

__all__ = [
    "FrontendConfig",
    "log_mel_spectrogram",
    "nemo_frontend_config",
    "kaldi_frontend_config",
    "espnet_frontend_config",
    "resample",
]
