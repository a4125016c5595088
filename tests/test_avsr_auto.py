"""HF Auto-class integration for the AVSR family (VERDICT round-1 item 5).

Reference registers config/model/seq2seq/extractor/processor into the Auto
machinery (pkg/avsr/src/__init__.py:25-35); these tests drive the same flow
end-to-end against a faithful local HF checkpoint directory: AutoConfig
resolves the config, AutoModel / AutoModelForSpeechSeq2Seq load THROUGH the
weight converter and return the JAX models, and generation runs.
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from fixture_checkpoints import write_avhubert_hf_dir

from reazonspeech_tpu.avsr import (
    AVHubertConfig,
    AVHubertForConditionalGeneration,
    AVHubertModel,
    register_auto_classes,
)

# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    cfg = AVHubertConfig.tiny(audio_feat_dim=104)
    d = tmp_path_factory.mktemp("avhubert_ckpt")
    write_avhubert_hf_dir(str(d), cfg)
    return str(d), cfg


def test_register_returns_true():
    assert register_auto_classes() is True
    # idempotent
    assert register_auto_classes() is True


def test_autoconfig_resolves(model_dir):
    path, cfg = model_dir
    register_auto_classes()
    from transformers import AutoConfig

    hf_cfg = AutoConfig.from_pretrained(path)
    assert hf_cfg.model_type == "avhubert"
    assert hf_cfg.hidden_size == cfg.hidden_size


def test_automodel_for_speech_seq2seq_loads_and_generates(model_dir):
    path, cfg = model_dir
    register_auto_classes()
    from transformers import AutoModelForSpeechSeq2Seq

    model = AutoModelForSpeechSeq2Seq.from_pretrained(path)
    assert isinstance(model, AVHubertForConditionalGeneration)
    assert model.config.hidden_size == cfg.hidden_size

    audio = np.random.default_rng(0).standard_normal((1, 12, 104)).astype(np.float32)
    out = model.generate(audio=audio, num_beams=1, max_length=8)
    assert np.asarray(out).shape[0] == 1


def test_automodel_loads_encoder(model_dir):
    path, cfg = model_dir
    register_auto_classes()
    from transformers import AutoModel

    model = AutoModel.from_pretrained(path)
    assert isinstance(model, AVHubertModel)
    audio = np.random.default_rng(1).standard_normal((1, 12, 104)).astype(np.float32)
    hidden, mask = model(audio=audio)
    assert hidden.shape[:2] == (1, 12)
    assert np.isfinite(np.asarray(hidden)).all()
