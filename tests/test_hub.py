"""Offline-first HF-hub resolution + fail-loud loading.

Round-2 gates (VERDICT.md items 1/2): every flavor's ``load_model`` must
(a) RAISE with actionable instructions when no checkpoint resolves — random
weights are explicit opt-in — and (b) resolve a published checkpoint from
the HF cache layout, auto-convert it through the real container formats
(.nemo tar / espnet-zoo .pth / sherpa ONNX + icefall .pt), cache the
converted tree, and serve it. Containers are built by
fixture_checkpoints.py with faithful on-disk formats.
"""

import os
import shutil

import numpy as np
import pytest

from fixture_checkpoints import (
    write_espnet_zoo,
    write_hf_snapshot,
    write_k2_repo,
    write_nemo_archive,
)

from reazonspeech_tpu.core.hub import (
    CheckpointNotFoundError,
    converted_path,
    find_cached_snapshot,
)


@pytest.fixture
def offline_env(tmp_path, monkeypatch):
    """Isolated hub + converted caches; no ambient checkpoints."""
    hub = tmp_path / "hub"
    conv = tmp_path / "converted"
    hub.mkdir()
    monkeypatch.setenv("HF_HUB_CACHE", str(hub))
    monkeypatch.setenv("REAZONSPEECH_TPU_CACHE", str(conv))
    for var in (
        "REAZONSPEECH_TPU_NEMO_CHECKPOINT",
        "REAZONSPEECH_TPU_ESPNET_CHECKPOINT",
        "REAZONSPEECH_TPU_K2_CHECKPOINT",
        "REAZONSPEECH_TPU_K2_CHECKPOINT_DIR",
        "REAZONSPEECH_TPU_MODEL_SIZE",
    ):
        monkeypatch.delenv(var, raising=False)
    return hub, conv


# ---------------------------------------------------------------------------
# fail-loud
# ---------------------------------------------------------------------------


def test_nemo_load_raises_without_checkpoint(offline_env):
    from reazonspeech_tpu.nemo.asr.model import load_model

    with pytest.raises(CheckpointNotFoundError, match="random"):
        load_model()


def test_espnet_load_raises_without_checkpoint(offline_env):
    from reazonspeech_tpu.espnet.asr.model import load_model_container

    with pytest.raises(CheckpointNotFoundError):
        load_model_container()


def test_k2_load_raises_without_checkpoint(offline_env):
    from reazonspeech_tpu.k2.asr.huggingface import load_model

    with pytest.raises(CheckpointNotFoundError):
        load_model()


def test_k2_env_dir_set_but_missing_raises(offline_env, tmp_path, monkeypatch):
    """A set-but-wrong checkpoint dir must error, not fall back silently."""
    from reazonspeech_tpu.k2.asr.huggingface import load_model

    monkeypatch.setenv("REAZONSPEECH_TPU_K2_CHECKPOINT_DIR", str(tmp_path / "nope"))
    with pytest.raises(CheckpointNotFoundError, match="CHECKPOINT_DIR"):
        load_model()


def test_random_is_explicit_opt_in(offline_env):
    from reazonspeech_tpu.models.fastconformer import FastConformerConfig
    from reazonspeech_tpu.models.rnnt import RNNTConfig
    from reazonspeech_tpu.nemo.asr.model import load_model

    m = load_model(
        checkpoint="random",
        enc_cfg=FastConformerConfig.tiny(compute_dtype="float32"),
        rnnt_cfg=RNNTConfig.tiny(enc_dim=64, compute_dtype="float32"),
    )
    assert m.params is not None


# ---------------------------------------------------------------------------
# end-to-end: snapshot -> convert -> cache -> serve
# ---------------------------------------------------------------------------


def _tiny_nemo_cfgs():
    from reazonspeech_tpu.models.fastconformer import FastConformerConfig
    from reazonspeech_tpu.models.rnnt import RNNTConfig

    enc = FastConformerConfig.tiny(compute_dtype="float32")
    rnnt = RNNTConfig.tiny(enc_dim=enc.d_model, compute_dtype="float32")
    return enc, rnnt


def test_nemo_hub_resolution_end_to_end(offline_env):
    hub, conv = offline_env
    from reazonspeech_tpu.nemo.asr.model import HF_REPO_ID, load_model

    enc_cfg, rnnt_cfg = _tiny_nemo_cfgs()
    write_hf_snapshot(
        str(hub),
        HF_REPO_ID,
        lambda snap: write_nemo_archive(
            os.path.join(snap, "reazonspeech-nemo-v2.nemo"), enc_cfg, rnnt_cfg
        ),
    )
    assert find_cached_snapshot(HF_REPO_ID, require=("*.nemo",))

    model = load_model()
    # configs came from the archive's model_config.yaml
    assert model.enc_cfg.num_layers == enc_cfg.num_layers
    assert model.enc_cfg.d_model == enc_cfg.d_model
    assert model.rnnt_cfg.vocab_size == rnnt_cfg.vocab_size
    # the archive's decoding section drives the serving decode strategy
    # (ALSD beam, the reference default)
    from reazonspeech_tpu.decoding.rnnt_beam import BeamDecodeConfig

    assert isinstance(model.decode_cfg, BeamDecodeConfig)
    assert model.decode_cfg.beam_size == 4
    # explicit override still wins
    greedy = load_model(decoding="greedy")
    from reazonspeech_tpu.decoding.rnnt_greedy import GreedyDecodeConfig

    assert isinstance(greedy.decode_cfg, GreedyDecodeConfig)
    # the converted tree was cached
    assert os.path.exists(converted_path(HF_REPO_ID, "model") + ".npz")

    # second load resolves from the converted cache even with the hub gone
    shutil.rmtree(hub)
    model2 = load_model()
    a = np.asarray(model.params["joint"]["enc"]["w"])
    b = np.asarray(model2.params["joint"]["enc"]["w"])
    np.testing.assert_array_equal(a, b)

    # and the model transcribes through the converted weights
    wav = (np.random.default_rng(0).standard_normal(16000) * 0.05).astype(np.float32)
    tokens, frames = model.decode_single(wav)
    assert isinstance(tokens, list)


def test_espnet_hub_resolution_end_to_end(offline_env):
    hub, conv = offline_env
    from reazonspeech_tpu.espnet.asr.model import HF_REPO_ID, load_model_container
    from reazonspeech_tpu.models.conformer import espnet_encoder_config
    from reazonspeech_tpu.models.rnnt import RNNTConfig

    enc_cfg = espnet_encoder_config(
        # ESPnet Conv2dSubsampling channels == output_size (odim)
        num_layers=2, d_model=32, num_heads=4, subsampling_channels=32,
        compute_dtype="float32",
    )
    token_list = ["<blank>"] + list("あいうえおかきくけこ") + ["<sos/eos>"]
    rnnt_cfg = RNNTConfig(
        vocab_size=len(token_list), enc_dim=32, pred_hidden=16, joint_hidden=24,
        joint_activation="tanh", blank_position="first", compute_dtype="float32",
    )
    write_hf_snapshot(
        str(hub),
        HF_REPO_ID,
        lambda snap: write_espnet_zoo(snap, enc_cfg, token_list, rnnt_cfg),
    )

    model = load_model_container()
    # token list came from config.yaml; encoder dims from encoder_conf
    assert model.tokenizer.pieces[0] == "<blank>"
    assert len(model.tokenizer.pieces) == len(token_list)
    assert model.enc_cfg.d_model == 32
    assert model.enc_cfg.final_norm  # espnet after_norm present
    assert model.rnnt_cfg.blank_first and model.rnnt_cfg.joint_activation == "tanh"
    assert os.path.exists(converted_path(HF_REPO_ID, "model") + ".npz")


def test_k2_hub_resolution_end_to_end(offline_env, monkeypatch):
    hub, conv = offline_env
    from reazonspeech_tpu.k2.asr.huggingface import LANGUAGE_MODELS, load_model
    from reazonspeech_tpu.models.rnnt import RNNTConfig
    from reazonspeech_tpu.models.zipformer import ZipformerConfig

    monkeypatch.setenv("REAZONSPEECH_TPU_MODEL_SIZE", "tiny")
    enc_cfg = ZipformerConfig.tiny()
    token_list = ["<blk>", "<sos/eos>", "<unk>"] + list("あいうえおかきくけこ")
    rnnt_cfg = RNNTConfig(
        vocab_size=len(token_list), enc_dim=enc_cfg.out_dim, pred_hidden=16,
        joint_hidden=24, joint_activation="tanh", predictor_kind="stateless",
        context_size=2,
    )
    repo_id, epochs = LANGUAGE_MODELS["ja"]
    shared_sd = {}

    def build_fp32(snap):
        shared_sd.update(write_k2_repo(snap, enc_cfg, rnnt_cfg, token_list, epochs))

    write_hf_snapshot(str(hub), repo_id, build_fp32)

    model = load_model()
    assert model.token_list == token_list
    assert model.rnnt_cfg.vocab_size == len(token_list)
    assert os.path.exists(converted_path(repo_id, "fp32") + ".npz")

    # int8 precision converts the published quantized decoder/joiner graphs
    def build_int8(snap):
        write_k2_repo(
            snap, enc_cfg, rnnt_cfg, token_list, epochs, int8=True, sd=shared_sd
        )

    shutil.rmtree(hub)
    hub.mkdir()
    write_hf_snapshot(str(hub), repo_id, build_int8)
    model8 = load_model(precision="int8")
    assert os.path.exists(converted_path(repo_id, "int8") + ".npz")
    # int8 round trip stays close to the fp32 weights
    w32 = np.asarray(model.params["joint"]["out"]["w"], np.float32)
    w8 = np.asarray(model8.params["joint"]["out"]["w"], np.float32)
    assert np.abs(w32 - w8).max() <= np.abs(w32).max() / 100.0


def test_k2_onnx_only_snapshot_raises_with_explanation(offline_env, monkeypatch):
    """Without the icefall .pt the encoder cannot convert from the
    constant-folded ONNX graph — the error says so."""
    hub, conv = offline_env
    from reazonspeech_tpu.k2.asr.huggingface import LANGUAGE_MODELS, load_model
    from reazonspeech_tpu.models.rnnt import RNNTConfig
    from reazonspeech_tpu.models.zipformer import ZipformerConfig

    monkeypatch.setenv("REAZONSPEECH_TPU_MODEL_SIZE", "tiny")
    enc_cfg = ZipformerConfig.tiny()
    token_list = ["<blk>", "<sos/eos>", "<unk>"] + list("あいうえお")
    rnnt_cfg = RNNTConfig(
        vocab_size=len(token_list), enc_dim=enc_cfg.out_dim, pred_hidden=16,
        joint_hidden=24, predictor_kind="stateless", context_size=2,
    )
    repo_id, epochs = LANGUAGE_MODELS["ja"]
    write_hf_snapshot(
        str(hub),
        repo_id,
        lambda snap: write_k2_repo(
            snap, enc_cfg, rnnt_cfg, token_list, epochs, with_pt=False
        ),
    )
    with pytest.raises(FileNotFoundError, match="icefall"):
        load_model()


def test_v1_default_model_raises_offline(offline_env):
    from reazonspeech_tpu.v1.transcribe import load_default_model

    with pytest.raises(CheckpointNotFoundError):
        load_default_model()
