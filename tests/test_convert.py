"""Checkpoint conversion tests: torch-vs-JAX numeric parity for every
primitive layout transform, structural round-trips for the full trees, and a
hand-assembled ONNX file for the first-party reader."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reazonspeech_tpu.convert.torch_utils import (
    t_batch_norm,
    t_conv1d,
    t_conv2d,
    t_conv3d,
    t_depthwise_conv1d,
    t_layer_norm,
    t_linear,
    t_lstm_layer,
)
from reazonspeech_tpu.models import layers as L
from fixture_checkpoints import (
    encode_varint,
    field,
    synth_espnet_state_dict,
    synth_icefall_state_dict,
    synth_nemo_state_dict,
)

# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow

RNG = np.random.default_rng(0)


def rt(*shape):
    return torch.from_numpy(RNG.standard_normal(shape).astype(np.float32))


# ---------------------------------------------------------------------------
# primitive parity
# ---------------------------------------------------------------------------

def test_linear_parity():
    m = torch.nn.Linear(12, 7)
    x = rt(3, 12)
    want = m(x).detach().numpy()
    p = t_linear(m.weight, m.bias)
    got = np.asarray(L.dense(jax.tree.map(jnp.asarray, p), jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv1d_parity():
    m = torch.nn.Conv1d(6, 10, 5, padding=2)
    x = rt(2, 6, 19)  # [B, C, T]
    want = m(x).detach().numpy().transpose(0, 2, 1)  # -> [B, T, C]
    p = t_conv1d(m.weight, m.bias)
    got = np.asarray(
        L.conv1d(jax.tree.map(jnp.asarray, p), jnp.asarray(x.numpy().transpose(0, 2, 1)))
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_depthwise_conv1d_parity():
    m = torch.nn.Conv1d(8, 8, 9, padding=4, groups=8)
    x = rt(2, 8, 21)
    want = m(x).detach().numpy().transpose(0, 2, 1)
    p = t_depthwise_conv1d(m.weight, m.bias)
    got = np.asarray(
        L.depthwise_conv1d(
            jax.tree.map(jnp.asarray, p), jnp.asarray(x.numpy().transpose(0, 2, 1))
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv2d_parity():
    m = torch.nn.Conv2d(3, 5, 3, stride=2, padding=1)
    x = rt(2, 3, 17, 11)
    want = m(x).detach().numpy().transpose(0, 2, 3, 1)
    p = t_conv2d(m.weight, m.bias)
    got = np.asarray(
        L.conv2d(
            jax.tree.map(jnp.asarray, p),
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
            stride=2,
            padding=[(1, 1), (1, 1)],
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv3d_parity():
    from reazonspeech_tpu.avsr.resnet3d import _conv3d

    m = torch.nn.Conv3d(1, 4, (5, 7, 7), stride=(1, 2, 2), padding=(2, 3, 3), bias=False)
    x = rt(1, 1, 6, 32, 32)
    want = m(x).detach().numpy().transpose(0, 2, 3, 4, 1)
    p = t_conv3d(m.weight)
    got = np.asarray(
        _conv3d(
            jax.tree.map(jnp.asarray, p),
            jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1)),
            (1, 2, 2),
            [(2, 2), (3, 3), (3, 3)],
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_lstm_parity():
    """Converted torch LSTM weights must reproduce torch outputs through our
    predictor cell, step by step."""
    from reazonspeech_tpu.models.rnnt import RNNTConfig, predictor_sequence

    hidden, vocab, u = 16, 10, 5
    m = torch.nn.LSTM(hidden, hidden, num_layers=2, batch_first=True)
    emb = torch.nn.Embedding(vocab, hidden)

    cfg = RNNTConfig(
        vocab_size=vocab, pred_hidden=hidden, pred_rnn_layers=2,
        compute_dtype="float32",
    )
    params = {
        "embed": {"table": jnp.asarray(emb.weight.detach().numpy())},
        "lstm": [
            jax.tree.map(
                jnp.asarray,
                t_lstm_layer(
                    getattr(m, f"weight_ih_l{k}"), getattr(m, f"weight_hh_l{k}"),
                    getattr(m, f"bias_ih_l{k}"), getattr(m, f"bias_hh_l{k}"),
                ),
            )
            for k in range(2)
        ],
    }

    tokens = torch.randint(0, vocab, (2, u))
    # torch: SOS is a zero vector input, like our blank embedding
    sos = torch.zeros(2, 1, hidden)
    inp = torch.cat([sos, emb(tokens)], dim=1)
    want, _ = m(inp)
    got = predictor_sequence(params, jnp.asarray(tokens.numpy().astype(np.int32)), cfg)
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=1e-5)


def test_batch_norm_parity():
    m = torch.nn.BatchNorm1d(6).eval()
    with torch.no_grad():
        m.running_mean.copy_(rt(6))
        m.running_var.copy_(rt(6).abs() + 0.5)
        m.weight.copy_(rt(6))
        m.bias.copy_(rt(6))
    x = rt(2, 6, 9)
    want = m(x).detach().numpy().transpose(0, 2, 1)
    p = t_batch_norm(m.weight, m.bias, m.running_mean, m.running_var)
    got = np.asarray(
        L.batch_norm_infer(jax.tree.map(jnp.asarray, p), jnp.asarray(x.numpy().transpose(0, 2, 1)))
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_layer_norm_parity():
    m = torch.nn.LayerNorm(8)
    with torch.no_grad():
        m.weight.copy_(rt(8))
        m.bias.copy_(rt(8))
    x = rt(2, 5, 8)
    want = m(x).detach().numpy()
    p = t_layer_norm(m.weight, m.bias)
    got = np.asarray(L.layer_norm(jax.tree.map(jnp.asarray, p), jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------------------
# full-tree structural round trips
# ---------------------------------------------------------------------------

def test_nemo_conversion_structure_and_run():
    from reazonspeech_tpu.convert.nemo_fastconformer import convert_nemo_state_dict
    from reazonspeech_tpu.models.fastconformer import (
        FastConformerConfig,
        fastconformer_encode,
    )
    from reazonspeech_tpu.models.rnnt import RNNTConfig
    from reazonspeech_tpu.nemo.asr.model import init_params

    enc_cfg = FastConformerConfig.tiny(compute_dtype="float32")
    rnnt_cfg = RNNTConfig.tiny(enc_dim=enc_cfg.d_model, compute_dtype="float32")
    sd = synth_nemo_state_dict(enc_cfg, rnnt_cfg)
    params = convert_nemo_state_dict(sd, enc_cfg, rnnt_cfg)

    # leaf structure identical to a random init
    template = init_params(0, enc_cfg, rnnt_cfg)
    got = {jax.tree_util.keystr(k): v.shape for k, v in
           jax.tree_util.tree_flatten_with_path(params)[0]}
    want = {jax.tree_util.keystr(k): v.shape for k, v in
            jax.tree_util.tree_flatten_with_path(template)[0]}
    assert got == want

    # converted tree runs end-to-end
    feats = jnp.asarray(RNG.standard_normal((1, 64, enc_cfg.feat_in)), jnp.float32)
    enc, lens = fastconformer_encode(
        jax.tree.map(jnp.asarray, params["encoder"]), feats, jnp.array([64]), enc_cfg
    )
    assert np.isfinite(np.asarray(enc)).all()


def test_espnet_conversion_structure():
    """Full espnet2 state dict (encoder + after_norm + CTC + transducer
    decoder/joint) converts, and the converted tree runs end-to-end."""
    from reazonspeech_tpu.convert.espnet_conformer import convert_espnet_state_dict
    from reazonspeech_tpu.models.conformer import espnet_encoder_config
    from reazonspeech_tpu.models.rnnt import RNNTConfig

    enc_cfg = espnet_encoder_config(
        num_layers=2, d_model=32, num_heads=4, subsampling_channels=8,
        compute_dtype="float32",
    )
    rnnt_cfg = RNNTConfig(
        vocab_size=20, enc_dim=32, pred_hidden=16, joint_hidden=24,
        joint_activation="tanh", blank_position="first",
        compute_dtype="float32",
    )
    sd = synth_espnet_state_dict(enc_cfg, 20, rnnt_cfg)

    params = convert_espnet_state_dict(sd, enc_cfg)
    assert "ctc" in params
    assert "after_norm" in params["encoder"]
    assert "predictor" in params and "joint" in params
    from reazonspeech_tpu.models.fastconformer import fastconformer_encode

    feats = jnp.asarray(RNG.standard_normal((1, 64, enc_cfg.feat_in)), jnp.float32)
    enc, lens = fastconformer_encode(
        jax.tree.map(jnp.asarray, params["encoder"]), feats, jnp.array([64]), enc_cfg
    )
    assert np.isfinite(np.asarray(enc)).all()

    # converted espnet transducer (LSTM predictor, blank-first) greedy-decodes
    from reazonspeech_tpu.decoding.rnnt_greedy import rnnt_greedy_decode

    tokens, frames, counts = rnnt_greedy_decode(
        jax.tree.map(jnp.asarray, params["predictor"]),
        jax.tree.map(jnp.asarray, params["joint"]),
        enc, lens, rnnt_cfg,
    )
    assert tokens.shape[0] == 1


# ---------------------------------------------------------------------------
# ONNX reader
# ---------------------------------------------------------------------------

def test_onnx_reader_roundtrip(tmp_path):
    from reazonspeech_tpu.convert.onnx_reader import read_onnx_initializers

    w = RNG.standard_normal((3, 4)).astype(np.float32)
    tensor = (
        field(1, 0, encode_varint(3))
        + field(1, 0, encode_varint(4))
        + field(2, 0, encode_varint(1))  # float32
        + field(8, 2, b"encoder.w")
        + field(9, 2, w.tobytes())
    )
    i8 = np.array([1, -2, 3], np.int8)
    tensor2 = (
        field(1, 0, encode_varint(3))
        + field(2, 0, encode_varint(3))  # int8
        + field(8, 2, b"encoder.w_quant")
        + field(9, 2, i8.tobytes())
    )
    graph = field(5, 2, tensor) + field(5, 2, tensor2)
    model = field(7, 2, graph)
    p = tmp_path / "m.onnx"
    p.write_bytes(model)

    out = read_onnx_initializers(str(p))
    np.testing.assert_array_equal(out["encoder.w"], w)
    np.testing.assert_array_equal(out["encoder.w_quant"], i8)


def test_icefall_conversion_structure_and_run():
    from reazonspeech_tpu.convert.icefall_zipformer import convert_icefall_state_dict
    from reazonspeech_tpu.models.rnnt import RNNTConfig
    from reazonspeech_tpu.models.zipformer import (
        ZipformerConfig,
        init_zipformer,
        zipformer_encode,
    )

    enc_cfg = ZipformerConfig.tiny(compute_dtype="float32")
    rnnt_cfg = RNNTConfig(
        vocab_size=50, enc_dim=enc_cfg.out_dim, pred_hidden=16, joint_hidden=16,
        predictor_kind="stateless", compute_dtype="float32",
    )
    sd = synth_icefall_state_dict(enc_cfg, rnnt_cfg)
    params = convert_icefall_state_dict(sd, enc_cfg, rnnt_cfg)

    # encoder leaf structure identical to random init
    template = init_zipformer(jax.random.PRNGKey(0), enc_cfg)
    got = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in
           jax.tree_util.tree_flatten_with_path(params["encoder"])[0]}
    want = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in
            jax.tree_util.tree_flatten_with_path(template)[0]}
    assert got == want

    feats = jnp.asarray(RNG.standard_normal((1, 64, enc_cfg.feat_in)), jnp.float32)
    enc, lens = zipformer_encode(
        jax.tree.map(jnp.asarray, params["encoder"]), feats, jnp.array([64]), enc_cfg
    )
    assert np.isfinite(np.asarray(enc)).all()

    # converted predictor/joint run through the greedy decode
    from reazonspeech_tpu.decoding.rnnt_greedy import rnnt_greedy_decode

    tokens, frames, counts = rnnt_greedy_decode(
        jax.tree.map(jnp.asarray, params["predictor"]),
        jax.tree.map(jnp.asarray, params["joint"]),
        enc, lens, rnnt_cfg,
    )
    assert tokens.shape[0] == 1
