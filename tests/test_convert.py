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

def synth_nemo_state_dict(enc_cfg, rnnt_cfg):
    """Random tensors with NeMo's naming for a tiny config."""
    d, dff = enc_cfg.d_model, enc_cfg.d_model * enc_cfg.ff_expansion
    c = enc_cfg.subsampling_channels
    h, dh = enc_cfg.num_heads, enc_cfg.head_dim
    sd = {}

    def add(name, *shape):
        sd[name] = rt(*shape)

    add("encoder.pre_encode.conv.0.weight", c, 1, 3, 3)
    add("encoder.pre_encode.conv.0.bias", c)
    idx = 2
    for i in range(1, 3):
        add(f"encoder.pre_encode.conv.{idx}.weight", c, 1, 3, 3)
        add(f"encoder.pre_encode.conv.{idx}.bias", c)
        add(f"encoder.pre_encode.conv.{idx+1}.weight", c, c, 1, 1)
        add(f"encoder.pre_encode.conv.{idx+1}.bias", c)
        idx += 3
    f_out = enc_cfg.feat_in
    for _ in range(3):
        f_out = (f_out - 1) // 2 + 1
    add("encoder.pre_encode.out.weight", d, c * f_out)
    add("encoder.pre_encode.out.bias", d)

    for n in range(enc_cfg.num_layers):
        p = f"encoder.layers.{n}"
        for ln in ("norm_feed_forward1", "norm_self_att", "norm_conv",
                   "norm_feed_forward2", "norm_out"):
            add(f"{p}.{ln}.weight", d)
            add(f"{p}.{ln}.bias", d)
        for ff in ("feed_forward1", "feed_forward2"):
            add(f"{p}.{ff}.linear1.weight", dff, d)
            add(f"{p}.{ff}.linear1.bias", dff)
            add(f"{p}.{ff}.linear2.weight", d, dff)
            add(f"{p}.{ff}.linear2.bias", d)
        for qkv in ("linear_q", "linear_k", "linear_v", "linear_out"):
            add(f"{p}.self_attn.{qkv}.weight", d, d)
            add(f"{p}.self_attn.{qkv}.bias", d)
        add(f"{p}.self_attn.linear_pos.weight", d, d)
        add(f"{p}.self_attn.pos_bias_u", h, dh)
        add(f"{p}.self_attn.pos_bias_v", h, dh)
        add(f"{p}.conv.pointwise_conv1.weight", 2 * d, d, 1)
        add(f"{p}.conv.pointwise_conv1.bias", 2 * d)
        add(f"{p}.conv.depthwise_conv.weight", d, 1, enc_cfg.conv_kernel)
        add(f"{p}.conv.depthwise_conv.bias", d)
        for bn in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{p}.conv.batch_norm.{bn}"] = (
                rt(d).abs() + 0.5 if bn == "running_var" else rt(d)
            )
        add(f"{p}.conv.pointwise_conv2.weight", d, d, 1)
        add(f"{p}.conv.pointwise_conv2.bias", d)

    add("decoder.prediction.embed.weight", rnnt_cfg.vocab_size, rnnt_cfg.pred_hidden)
    for k in range(rnnt_cfg.pred_rnn_layers):
        add(f"decoder.prediction.dec_rnn.lstm.weight_ih_l{k}",
            4 * rnnt_cfg.pred_hidden, rnnt_cfg.pred_hidden)
        add(f"decoder.prediction.dec_rnn.lstm.weight_hh_l{k}",
            4 * rnnt_cfg.pred_hidden, rnnt_cfg.pred_hidden)
        add(f"decoder.prediction.dec_rnn.lstm.bias_ih_l{k}", 4 * rnnt_cfg.pred_hidden)
        add(f"decoder.prediction.dec_rnn.lstm.bias_hh_l{k}", 4 * rnnt_cfg.pred_hidden)
    add("joint.enc.weight", rnnt_cfg.joint_hidden, rnnt_cfg.enc_dim)
    add("joint.enc.bias", rnnt_cfg.joint_hidden)
    add("joint.pred.weight", rnnt_cfg.joint_hidden, rnnt_cfg.pred_hidden)
    add("joint.pred.bias", rnnt_cfg.joint_hidden)
    add("joint.joint_net.2.weight", rnnt_cfg.num_classes, rnnt_cfg.joint_hidden)
    add("joint.joint_net.2.bias", rnnt_cfg.num_classes)
    return sd


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
    from reazonspeech_tpu.convert.espnet_conformer import convert_espnet_state_dict
    from reazonspeech_tpu.models.conformer import espnet_encoder_config

    enc_cfg = espnet_encoder_config(
        num_layers=2, d_model=32, num_heads=4, subsampling_channels=8,
        compute_dtype="float32",
    )
    d, dff, c = 32, 128, 8
    sd = {}

    def add(name, *shape):
        sd[name] = rt(*shape)

    add("encoder.embed.conv.0.weight", c, 1, 3, 3)
    add("encoder.embed.conv.0.bias", c)
    add("encoder.embed.conv.2.weight", c, c, 3, 3)
    add("encoder.embed.conv.2.bias", c)
    f = enc_cfg.feat_in
    f = (f - 1) // 2
    f = (f - 1) // 2
    add("encoder.embed.out.0.weight", d, c * f)
    add("encoder.embed.out.0.bias", d)
    for n in range(2):
        p = f"encoder.encoders.{n}"
        for ln in ("norm_ff_macaron", "norm_mha", "norm_conv", "norm_ff", "norm_final"):
            add(f"{p}.{ln}.weight", d)
            add(f"{p}.{ln}.bias", d)
        for ff in ("feed_forward_macaron", "feed_forward"):
            add(f"{p}.{ff}.w_1.weight", dff, d)
            add(f"{p}.{ff}.w_1.bias", dff)
            add(f"{p}.{ff}.w_2.weight", d, dff)
            add(f"{p}.{ff}.w_2.bias", d)
        for qkv in ("linear_q", "linear_k", "linear_v", "linear_out"):
            add(f"{p}.self_attn.{qkv}.weight", d, d)
            add(f"{p}.self_attn.{qkv}.bias", d)
        add(f"{p}.self_attn.linear_pos.weight", d, d)
        add(f"{p}.self_attn.pos_bias_u", 4, 8)
        add(f"{p}.self_attn.pos_bias_v", 4, 8)
        add(f"{p}.conv_module.pointwise_conv1.weight", 2 * d, d, 1)
        add(f"{p}.conv_module.pointwise_conv1.bias", 2 * d)
        add(f"{p}.conv_module.depthwise_conv.weight", d, 1, enc_cfg.conv_kernel)
        add(f"{p}.conv_module.depthwise_conv.bias", d)
        add(f"{p}.conv_module.norm.weight", d)
        add(f"{p}.conv_module.norm.bias", d)
        add(f"{p}.conv_module.pointwise_conv2.weight", d, d, 1)
        add(f"{p}.conv_module.pointwise_conv2.bias", d)
    add("ctc.ctc_lo.weight", 20, d)
    add("ctc.ctc_lo.bias", 20)

    params = convert_espnet_state_dict(sd, enc_cfg)
    assert "ctc" in params
    from reazonspeech_tpu.models.fastconformer import fastconformer_encode

    feats = jnp.asarray(RNG.standard_normal((1, 64, enc_cfg.feat_in)), jnp.float32)
    enc, _ = fastconformer_encode(
        jax.tree.map(jnp.asarray, params["encoder"]), feats, jnp.array([64]), enc_cfg
    )
    assert np.isfinite(np.asarray(enc)).all()


# ---------------------------------------------------------------------------
# ONNX reader
# ---------------------------------------------------------------------------

def encode_varint(n):
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def field(num, wt, payload):
    key = encode_varint(num << 3 | wt)
    if wt == 2:
        return key + encode_varint(len(payload)) + payload
    return key + payload


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


def synth_icefall_state_dict(enc_cfg, rnnt_cfg):
    """Random tensors with the documented icefall zipformer2 naming."""
    sd = {}

    def add(name, *shape):
        sd[name] = rt(*shape)

    c1, c2, c3 = enc_cfg.embed_channels
    add("encoder_embed.conv.0.weight", c1, 1, 3, 3)
    add("encoder_embed.conv.0.bias", c1)
    add("encoder_embed.conv.4.weight", c2, c1, 3, 3)
    add("encoder_embed.conv.4.bias", c2)
    add("encoder_embed.conv.8.weight", c3, c2, 3, 3)
    add("encoder_embed.conv.8.bias", c3)
    f = enc_cfg.feat_in
    f = (f - 3) // 2 + 1
    f = (f - 3) // 2 + 1
    f = f - 2
    add("encoder_embed.out.weight", enc_cfg.encoder_dim[0], c3 * f)
    add("encoder_embed.out.bias", enc_cfg.encoder_dim[0])
    add("encoder_embed.out_norm.bias", enc_cfg.encoder_dim[0])
    sd["encoder_embed.out_norm.log_scale"] = np.zeros((), np.float32)

    qd, vd, pd = enc_cfg.query_head_dim, enc_cfg.value_head_dim, enc_cfg.pos_head_dim
    for s in range(len(enc_cfg.num_layers)):
        d = enc_cfg.encoder_dim[s]
        h = enc_cfg.num_heads[s]
        ffn = enc_cfg.ffn_dim[s]
        hidden = d * 3 // 4
        # downsampled stacks nest layers under .encoder
        base = (
            f"encoder.encoders.{s}.encoder.layers"
            if enc_cfg.downsampling[s] > 1
            else f"encoder.encoders.{s}.layers"
        )
        for j in range(enc_cfg.num_layers[s]):
            p = f"{base}.{j}"
            add(f"{p}.self_attn_weights.in_proj.weight", h * (2 * qd + pd), d)
            add(f"{p}.self_attn_weights.in_proj.bias", h * (2 * qd + pd))
            add(f"{p}.self_attn_weights.linear_pos.weight", h * pd, enc_cfg.pos_dim)
            for sa in ("self_attn1", "self_attn2"):
                add(f"{p}.{sa}.in_proj.weight", h * vd, d)
                add(f"{p}.{sa}.in_proj.bias", h * vd)
                add(f"{p}.{sa}.out_proj.weight", d, h * vd)
                add(f"{p}.{sa}.out_proj.bias", d)
            add(f"{p}.nonlin_attention.in_proj.weight", 3 * hidden, d)
            add(f"{p}.nonlin_attention.in_proj.bias", 3 * hidden)
            add(f"{p}.nonlin_attention.out_proj.weight", d, hidden)
            add(f"{p}.nonlin_attention.out_proj.bias", d)
            for ff in ("feed_forward1", "feed_forward2", "feed_forward3"):
                add(f"{p}.{ff}.in_proj.weight", ffn, d)
                add(f"{p}.{ff}.in_proj.bias", ffn)
                add(f"{p}.{ff}.out_proj.weight", d, ffn)
                add(f"{p}.{ff}.out_proj.bias", d)
            for cv in ("conv_module1", "conv_module2"):
                add(f"{p}.{cv}.in_proj.weight", 2 * d, d)
                add(f"{p}.{cv}.in_proj.bias", 2 * d)
                add(f"{p}.{cv}.depthwise_conv.weight", d, 1, enc_cfg.cnn_kernel[s])
                add(f"{p}.{cv}.depthwise_conv.bias", d)
                add(f"{p}.{cv}.out_proj.weight", d, d)
                add(f"{p}.{cv}.out_proj.bias", d)
            add(f"{p}.norm.bias", d)
            sd[f"{p}.norm.log_scale"] = np.zeros((), np.float32)
            add(f"{p}.bypass.bypass_scale", d)
            add(f"{p}.bypass_mid.bypass_scale", d)
        if enc_cfg.downsampling[s] > 1:
            add(f"encoder.encoders.{s}.downsample.bias", enc_cfg.downsampling[s])
            add(f"encoder.encoders.{s}.bypass.bypass_scale", d)

    v, dd, jd = rnnt_cfg.vocab_size, rnnt_cfg.pred_hidden, rnnt_cfg.joint_hidden
    add("decoder.embedding.weight", v, dd)
    add("decoder.conv.weight", dd, dd, rnnt_cfg.context_size)
    add("joiner.encoder_proj.weight", jd, rnnt_cfg.enc_dim)
    add("joiner.encoder_proj.bias", jd)
    add("joiner.decoder_proj.weight", jd, dd)
    add("joiner.decoder_proj.bias", jd)
    add("joiner.output_linear.weight", rnnt_cfg.num_classes, jd)
    add("joiner.output_linear.bias", rnnt_cfg.num_classes)
    return sd


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
