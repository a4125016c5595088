"""The ``reazonspeech`` drop-in namespace mirrors the reference import paths.

Code written against the reference packages must import unchanged; each
case below is an import the reference's own __init__ exposes:
pkg/{k2,nemo,espnet}-asr/src/__init__.py, pkg/espnet-oneseg/src/__init__.py,
pkg/evaluation/src/__init__.py, pkg/avsr/src/__init__.py (which also
registers the family into the HF Auto classes at import time), and the
top-level legacy v1 surface (pkg/_v1/src/__init__.py).
"""

import importlib

import pytest


@pytest.mark.parametrize(
    "module, symbols",
    [
        (
            "reazonspeech.k2.asr",
            ["TranscribeConfig", "load_model", "transcribe",
             "audio_from_numpy", "audio_from_tensor", "audio_from_path"],
        ),
        (
            "reazonspeech.nemo.asr",
            ["TranscribeConfig", "transcribe", "load_model",
             "audio_from_numpy", "audio_from_tensor", "audio_from_path"],
        ),
        (
            "reazonspeech.espnet.asr",
            ["TranscribeConfig", "transcribe", "load_model",
             "audio_from_numpy", "audio_from_tensor", "audio_from_path"],
        ),
        (
            "reazonspeech.espnet.oneseg",
            ["get_captions", "build_sentences", "get_utterances",
             "save_as_zip", "load_audio"],
        ),
        (
            # the v1 legacy API lives at the top level (pkg/_v1)
            "reazonspeech",
            ["get_captions", "build_sentences", "get_utterances",
             "transcribe", "load_default_model", "TranscribeConfig"],
        ),
    ],
)
def test_reference_import_paths(module, symbols):
    mod = importlib.import_module(module)
    missing = [s for s in symbols if not hasattr(mod, s)]
    assert not missing, f"{module} missing {missing}"


def test_avsr_compat_namespace_registers_auto_classes():
    transformers = pytest.importorskip("transformers")
    avsr = importlib.import_module("reazonspeech.avsr")
    for s in [
        "AVHubertConfig",
        "AVHubertModel",
        "AVHubertForConditionalGeneration",
        "AVHubertFeatureExtractor",
        "AVHubertProcessor",
    ]:
        assert hasattr(avsr, s), s
    # import-time Auto registration, as the reference does
    # (pkg/avsr/src/__init__.py:25-35)
    from transformers import AutoConfig

    cfg = AutoConfig.for_model("avhubert")
    assert cfg.model_type == "avhubert"
