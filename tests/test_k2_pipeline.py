"""End-to-end tests of the k2-flavor public API on a tiny random model."""

import numpy as np
import pytest

from reazonspeech_tpu.k2.asr import (
    Subword,
    TranscribeConfig,
    audio_from_numpy,
    load_model,
    transcribe,
)
from reazonspeech_tpu.k2.asr.model import SECONDS_PER_FRAME, load_model_container
from reazonspeech_tpu.models.zipformer import ZipformerConfig
# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def tiny_model():
    return load_model_container(checkpoint="random", enc_cfg=ZipformerConfig.tiny(compute_dtype="float32"))


def test_load_model_validates_language():
    with pytest.raises(ValueError, match="Unknown language: 'de'"):
        load_model(language="de")
    with pytest.raises(ValueError, match="Unknown precision"):
        load_model(precision="fp16")


def test_transcribe_end_to_end(tiny_model):
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    ret = transcribe(tiny_model, audio_from_numpy(wav, 16000))
    assert isinstance(ret.text, str)
    for sw in ret.subwords:
        assert isinstance(sw, Subword)
        assert sw.seconds >= 0
        # timestamps on the 0.04 s grid within the padded duration (1s + 1.8s pad)
        assert sw.seconds <= 2.8
        assert abs(sw.seconds / SECONDS_PER_FRAME - round(sw.seconds / SECONDS_PER_FRAME)) < 1e-6
    assert not hasattr(ret, "segments")


def test_transcribe_warns_on_long_audio(tiny_model):
    wav = np.zeros(31 * 16000, np.float32)
    with pytest.warns(UserWarning, match="long audio input"):
        transcribe(tiny_model, audio_from_numpy(wav, 16000))


def test_stateless_predictor_blank_first():
    assert tiny_rnnt().blank_id == 0
    assert tiny_rnnt().num_classes == tiny_rnnt().vocab_size


def tiny_rnnt():
    from reazonspeech_tpu.models.rnnt import RNNTConfig

    return RNNTConfig(vocab_size=10, predictor_kind="stateless")


def test_stateless_predictor_step():
    import jax
    import jax.numpy as jnp

    from reazonspeech_tpu.models.rnnt import (
        init_predictor,
        predictor_step,
        predictor_zero_state,
    )

    cfg = tiny_rnnt()
    p = init_predictor(jax.random.PRNGKey(0), cfg)
    state = predictor_zero_state(2, cfg)
    assert state.shape == (2, cfg.context_size - 1)
    g, s1 = predictor_step(p, jnp.array([3, 4]), state, cfg)
    assert g.shape == (2, cfg.pred_hidden)
    assert s1.tolist() == [[3], [4]]
    # context influences output: same token, different history
    g2a, _ = predictor_step(p, jnp.array([5, 5]), s1, cfg)
    g2b, _ = predictor_step(p, jnp.array([5, 5]), predictor_zero_state(2, cfg), cfg)
    assert not np.allclose(np.asarray(g2a), np.asarray(g2b))


def test_transcribe_batch_matches_single(tiny_model):
    from reazonspeech_tpu.k2.asr.transcribe import transcribe_batch

    rng = np.random.default_rng(7)
    audios = [
        audio_from_numpy((rng.standard_normal(16000) * 0.1).astype(np.float32), 16000),
        audio_from_numpy((rng.standard_normal(9000) * 0.1).astype(np.float32), 16000),
    ]
    batch = transcribe_batch(tiny_model, audios)
    single = transcribe(tiny_model, audios[1])
    assert len(batch) == 2
    assert batch[1].text == single.text
    assert [s.seconds for s in batch[1].subwords] == [
        s.seconds for s in single.subwords
    ]


def test_k2_beam_decoding_option():
    """Beam search through the k2 stateless predictor (sherpa exposes
    modified_beam_search for the same models; the reference pins greedy)."""
    from reazonspeech_tpu.models.zipformer import ZipformerConfig

    model = load_model_container(
        checkpoint="random",
        enc_cfg=ZipformerConfig.tiny(compute_dtype="float32"),
        decoding="beam",
        beam_size=2,
    )
    import numpy as np

    wav = (np.random.default_rng(0).standard_normal(16000) * 0.05).astype(np.float32)
    tokens, frames = model.decode_single(wav)
    assert isinstance(tokens, list)
    assert all(t != model.rnnt_cfg.blank_id for t in tokens)
