"""Compat shim: ``reazonspeech.avsr`` — the reference's avsr import path.

The reference package registers its five classes into the HF Auto classes
at import time (pkg/avsr/src/__init__.py:25-35); this shim mirrors that:
importing ``reazonspeech.avsr`` re-exports the family from
``reazonspeech_tpu.avsr`` and performs the Auto registration (a no-op when
transformers is not importable).
"""

from reazonspeech_tpu.avsr import (  # noqa: F401
    AVHubertConfig,
    AVHubertFeatureExtractor,
    AVHubertForConditionalGeneration,
    AVHubertModel,
    AVHubertProcessor,
    register_auto_classes,
)

__all__ = [
    "AVHubertConfig",
    "AVHubertModel",
    "AVHubertForConditionalGeneration",
    "AVHubertFeatureExtractor",
    "AVHubertProcessor",
]

register_auto_classes()
