"""Shape-driven sherpa decoder/joiner conversion, tested against a torch
reference of the k2 stateless decoder built into synthetic ONNX files."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reazonspeech_tpu.convert.onnx_zipformer import convert_decoder_joiner
from reazonspeech_tpu.models.rnnt import (
    RNNTConfig,
    joint_step,
    predictor_step,
    predictor_zero_state,
)
from tests.test_convert import encode_varint, field


def onnx_tensor(name, arr):
    t = b""
    for d in arr.shape:
        t += field(1, 0, encode_varint(d))
    dtype = {np.float32: 1}[arr.dtype.type]
    t += field(2, 0, encode_varint(dtype))
    t += field(8, 2, name.encode())
    t += field(9, 2, arr.astype("<f4").tobytes())
    return t


def onnx_file(path, tensors):
    graph = b"".join(field(5, 2, onnx_tensor(n, a)) for n, a in tensors.items())
    path.write_bytes(field(7, 2, graph))


def test_decoder_joiner_conversion_matches_torch(tmp_path):
    v, d, j, enc_dim, ctx = 40, 16, 24, 32, 2
    cfg = RNNTConfig(
        vocab_size=v, enc_dim=enc_dim, pred_hidden=d, joint_hidden=j,
        predictor_kind="stateless", context_size=ctx, joint_activation="relu",
        compute_dtype="float32",
    )
    rng = np.random.default_rng(0)

    # torch reference: k2 stateless decoder = embedding -> conv1d(k=ctx) -> relu
    emb = torch.nn.Embedding(v, d)
    conv = torch.nn.Conv1d(d, d, ctx)
    enc_proj = torch.nn.Linear(enc_dim, j)
    dec_proj = torch.nn.Linear(d, j)
    out_proj = torch.nn.Linear(j, v)

    onnx_file(
        tmp_path / "decoder.onnx",
        {
            "embedding.weight": emb.weight.detach().numpy(),
            "conv.weight": conv.weight.detach().numpy(),
            "conv.bias": conv.bias.detach().numpy(),
        },
    )
    onnx_file(
        tmp_path / "joiner.onnx",
        {
            "enc.weight": enc_proj.weight.detach().numpy(),
            "enc.bias": enc_proj.bias.detach().numpy(),
            "dec.weight": dec_proj.weight.detach().numpy(),
            "dec.bias": dec_proj.bias.detach().numpy(),
            "out.weight": out_proj.weight.detach().numpy(),
            "out.bias": out_proj.bias.detach().numpy(),
        },
    )

    predictor, joint = convert_decoder_joiner(
        str(tmp_path / "decoder.onnx"), str(tmp_path / "joiner.onnx"), cfg
    )
    predictor = jax.tree.map(jnp.asarray, predictor)
    joint = jax.tree.map(jnp.asarray, joint)

    # torch forward for context [blank, tok]
    tok = 7
    context = torch.tensor([[0, tok]])
    t_emb = emb(context).transpose(1, 2)  # [1, D, ctx]
    t_g = torch.relu(conv(t_emb))[:, :, 0]  # [1, D]
    enc_frame = rng.standard_normal((1, enc_dim)).astype(np.float32)
    t_logits = out_proj(
        torch.relu(enc_proj(torch.from_numpy(enc_frame)) + dec_proj(t_g))
    ).detach().numpy()

    # ours
    state = predictor_zero_state(1, cfg)  # [blank]
    g, _ = predictor_step(predictor, jnp.array([tok]), state, cfg)
    np.testing.assert_allclose(np.asarray(g), t_g.detach().numpy(), atol=1e-5)
    logits = joint_step(joint, jnp.asarray(enc_frame), g, cfg)
    np.testing.assert_allclose(np.asarray(logits), t_logits, atol=1e-5)


def test_decoder_conversion_rejects_wrong_shapes(tmp_path):
    cfg = RNNTConfig(
        vocab_size=10, pred_hidden=8, predictor_kind="stateless", context_size=2
    )
    onnx_file(tmp_path / "d.onnx", {"bogus": np.zeros((3, 3), np.float32)})
    onnx_file(tmp_path / "j.onnx", {"bogus": np.zeros((3, 3), np.float32)})
    with pytest.raises(ValueError, match="decoder graph tensors"):
        convert_decoder_joiner(str(tmp_path / "d.onnx"), str(tmp_path / "j.onnx"), cfg)
