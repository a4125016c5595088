"""reazonspeech_tpu.avsr — audio-visual speech recognition (AVHuBERT family).

First-party JAX rebuild of the reference's in-repo PyTorch AVHuBERT
(pkg/avsr/src/avhubert/): config, feature extractor (host-side audio fbank +
video mouth-ROI pipeline), processor, ResNet3D+transformer encoder, cached
transformer decoder with greedy/beam generation.

When HF transformers is importable, the config/extractor/processor register
into the Auto classes under model_type "avhubert" for ecosystem parity with
the reference (pkg/avsr/src/__init__.py:25-35).
"""

from .configuration_avhubert import AVHubertConfig
from .feature_extraction import AVHubertFeatureExtractor
from .model import (
    AVHubertModel,
    AVHubertForConditionalGeneration,
)
from .processing import AVHubertProcessor

__all__ = [
    "AVHubertConfig",
    "AVHubertFeatureExtractor",
    "AVHubertProcessor",
    "AVHubertModel",
    "AVHubertForConditionalGeneration",
]


def register_auto_classes():
    """Register the family into HF Auto classes (no-op without transformers)."""
    try:
        from transformers import AutoConfig, AutoFeatureExtractor

        AutoConfig.register("avhubert", AVHubertConfig.hf_config_class())
        AutoFeatureExtractor.register(
            AVHubertConfig.hf_config_class(), AVHubertFeatureExtractor
        )
        return True
    except Exception:
        return False
