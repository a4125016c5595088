import numpy as np
import pytest

from reazonspeech_tpu.convert.quantize import (
    dequantize_tree,
    is_quantized,
    quantize_tree,
)
from reazonspeech_tpu.convert.store import load_param_tree, save_param_tree
# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow



def test_quantize_roundtrip_accuracy():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((128, 256)).astype(np.float32)
    tree = {"layer": {"w": w, "b": rng.standard_normal(8).astype(np.float32)}}
    q = quantize_tree(tree)
    assert is_quantized(q)
    assert q["layer"]["w"]["__q8__"].dtype == np.int8
    # small tensors untouched
    assert q["layer"]["b"].dtype == np.float32

    d = dequantize_tree(q)
    assert not is_quantized(d)
    # per-channel symmetric int8: error bounded by scale/2 per channel
    err = np.abs(d["layer"]["w"] - w)
    scale = np.abs(w).max(axis=0) / 127.0
    assert (err <= scale[None, :] * 0.5 + 1e-7).all()
    # relative quality
    rel = np.linalg.norm(d["layer"]["w"] - w) / np.linalg.norm(w)
    assert rel < 0.01


def test_quantized_tree_survives_store(tmp_path):
    rng = np.random.default_rng(1)
    tree = {"enc": {"w": rng.standard_normal((64, 128)).astype(np.float32)}}
    q = quantize_tree(tree)
    p = str(tmp_path / "ckpt")
    save_param_tree(p, q, {"precision": "int8"})
    loaded, meta = load_param_tree(p)
    assert meta["precision"] == "int8"
    d = dequantize_tree(loaded)
    np.testing.assert_allclose(
        np.asarray(d["enc"]["w"]),
        np.asarray(dequantize_tree(q)["enc"]["w"]),
        atol=1e-7,
    )


def test_k2_int8_checkpoint_load(tmp_path, monkeypatch):
    """A quantized k2 checkpoint must load and dequantize transparently."""
    from reazonspeech_tpu.k2.asr.model import load_model_container
    from reazonspeech_tpu.models.rnnt import RNNTConfig, init_joint, init_predictor
    from reazonspeech_tpu.models.zipformer import ZipformerConfig, init_zipformer

    import jax

    enc_cfg = ZipformerConfig.tiny(compute_dtype="float32")
    token_list = ["<blk>", "<unk>", "あ", "い"]
    rnnt_cfg = RNNTConfig(
        vocab_size=4, enc_dim=enc_cfg.out_dim, pred_hidden=16, joint_hidden=16,
        predictor_kind="stateless", compute_dtype="float32",
    )
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "encoder": jax.tree.map(np.asarray, init_zipformer(k1, enc_cfg)),
        "predictor": jax.tree.map(np.asarray, init_predictor(k2, rnnt_cfg)),
        "joint": jax.tree.map(np.asarray, init_joint(k3, rnnt_cfg)),
    }
    q = quantize_tree(params)
    p = str(tmp_path / "k2_int8")
    save_param_tree(p, q, {"token_list": token_list})

    model = load_model_container(
        checkpoint=p, enc_cfg=enc_cfg, rnnt_cfg=rnnt_cfg
    )
    assert model.token_list == token_list
    assert not is_quantized(model.params)
    # loaded weights ≈ originals within int8 error
    w0 = params["joint"]["out"]["w"]
    w1 = np.asarray(model.params["joint"]["out"]["w"])
    assert np.abs(w0 - w1).max() < np.abs(w0).max() / 64


def test_transcribe_batch():
    import warnings

    from reazonspeech_tpu.models.fastconformer import FastConformerConfig
    from reazonspeech_tpu.models.rnnt import RNNTConfig
    from reazonspeech_tpu.nemo.asr import audio_from_numpy, load_model, transcribe
    from reazonspeech_tpu.nemo.asr.transcribe import transcribe_batch

    enc_cfg = FastConformerConfig.tiny(compute_dtype="float32")
    rnnt_cfg = RNNTConfig.tiny(enc_dim=enc_cfg.d_model, compute_dtype="float32")
    model = load_model(enc_cfg=enc_cfg, rnnt_cfg=rnnt_cfg, checkpoint="random")

    rng = np.random.default_rng(0)
    audios = [
        audio_from_numpy((rng.standard_normal(16000) * 0.1).astype(np.float32), 16000),
        audio_from_numpy((rng.standard_normal(8000) * 0.1).astype(np.float32), 16000),
    ]
    batch_results = transcribe_batch(model, audios)
    assert len(batch_results) == 2
    # batch path must agree with the single path
    single = transcribe(model, audios[1])
    assert batch_results[1].text == single.text
    assert [s.seconds for s in batch_results[1].subwords] == [
        s.seconds for s in single.subwords
    ]
