"""RNN-T prediction + joint networks (TPU-native JAX).

First-party replacement for the NeMo RNNT decoder/joint that the reference
reaches through ``EncDecRNNTBPEModel`` (pkg/nemo-asr/src/transcribe.py:48-53),
and for sherpa-onnx's transducer decoder/joiner (pkg/k2-asr/src/huggingface.py:73-83).

Conventions (match NeMo so converted checkpoints drop in):
- ``blank_id == vocab_size`` (last logit); the embedding table has
  ``vocab_size`` rows and the start-of-sequence/blank context is the zero
  vector;
- LSTM gates packed in (input, forget, cell, output) order, torch layout;
- joint: out = W_out · act(W_enc·enc + W_pred·pred), logits over
  ``vocab_size + 1``.

The prediction network offers a one-step cell (used by the greedy/beam decode
scan) and a full-sequence scan (used by the RNN-T training loss).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .layers import dense, dense_init, embedding_init

__all__ = [
    "RNNTConfig",
    "init_predictor",
    "init_joint",
    "predictor_zero_state",
    "predictor_step",
    "predictor_sequence",
    "joint_step",
    "joint_full",
]


@dataclass(frozen=True)
class RNNTConfig:
    vocab_size: int = 3000
    enc_dim: int = 1024
    pred_hidden: int = 640
    pred_rnn_layers: int = 1
    joint_hidden: int = 640
    joint_activation: str = "relu"  # relu | tanh | sigmoid
    compute_dtype: str = "bfloat16"
    # "lstm": NeMo-style recurrent prediction network, blank == vocab_size
    #   (an extra class appended after the vocabulary);
    # "stateless": k2/icefall-style finite-context predictor (embedding of the
    #   last `context_size` tokens -> linear -> relu), blank == 0 and INCLUDED
    #   in vocab_size (k2 tokens.txt lists <blk> first).
    predictor_kind: str = "lstm"
    context_size: int = 2
    # where the blank logit lives: "auto" = last for lstm (NeMo), first for
    # stateless (k2). ESPnet transducers are lstm predictors with blank FIRST
    # (espnet2 TransducerDecoder: blank 0 shares the embedding table).
    blank_position: str = "auto"  # auto | first | last

    @property
    def blank_first(self) -> bool:
        if self.blank_position != "auto":
            return self.blank_position == "first"
        return self.predictor_kind == "stateless"

    @property
    def blank_id(self) -> int:
        return 0 if self.blank_first else self.vocab_size

    @property
    def num_classes(self) -> int:
        return self.vocab_size if self.blank_first else self.vocab_size + 1

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @staticmethod
    def tiny(**overrides) -> "RNNTConfig":
        cfg = dict(vocab_size=64, enc_dim=64, pred_hidden=32, joint_hidden=32)
        cfg.update(overrides)
        return RNNTConfig(**cfg)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _lstm_layer_init(key, in_dim, hidden):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = 1.0 / np.sqrt(hidden)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -s, s)
    return {
        "w_ih": u(k1, (in_dim, 4 * hidden)),
        "w_hh": u(k2, (hidden, 4 * hidden)),
        "b_ih": u(k3, (4 * hidden,)),
        "b_hh": u(k4, (4 * hidden,)),
    }


def init_predictor(key, cfg: RNNTConfig):
    if cfg.predictor_kind == "stateless":
        k1, k2 = jax.random.split(key)
        return {
            "embed": embedding_init(k1, cfg.vocab_size, cfg.pred_hidden),
            "ctx_proj": dense_init(
                k2, cfg.context_size * cfg.pred_hidden, cfg.pred_hidden
            ),
        }
    keys = jax.random.split(key, cfg.pred_rnn_layers + 1)
    layers = []
    in_dim = cfg.pred_hidden
    for i in range(cfg.pred_rnn_layers):
        layers.append(_lstm_layer_init(keys[i + 1], in_dim, cfg.pred_hidden))
        in_dim = cfg.pred_hidden
    return {
        "embed": embedding_init(keys[0], cfg.vocab_size, cfg.pred_hidden),
        "lstm": layers,
    }


def init_joint(key, cfg: RNNTConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "enc": dense_init(k1, cfg.enc_dim, cfg.joint_hidden),
        "pred": dense_init(k2, cfg.pred_hidden, cfg.joint_hidden),
        "out": dense_init(k3, cfg.joint_hidden, cfg.num_classes),
    }


# ---------------------------------------------------------------------------
# prediction network
# ---------------------------------------------------------------------------


def predictor_zero_state(batch, cfg: RNNTConfig):
    if cfg.predictor_kind == "stateless":
        # context of the last (context_size - 1) tokens, blank-padded
        return jnp.full((batch, cfg.context_size - 1), cfg.blank_id, jnp.int32)
    shape = (cfg.pred_rnn_layers, batch, cfg.pred_hidden)
    return (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))


def _lstm_cell(p, x, h, c):
    gates = (
        x @ p["w_ih"].astype(x.dtype)
        + h.astype(x.dtype) @ p["w_hh"].astype(x.dtype)
        + (p["b_ih"] + p["b_hh"]).astype(x.dtype)
    ).astype(jnp.float32)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _embed_tokens(p, tokens, cfg: RNNTConfig):
    """Blank-last (LSTM/NeMo) convention: blank_id == vocab_size is not in
    the table and embeds to zeros (the SOS context). Blank-first (stateless/
    k2): every id including blank has a real embedding row."""
    table = p["embed"]["table"]
    if cfg.blank_first:
        return table[tokens]
    safe = jnp.minimum(tokens, cfg.vocab_size - 1)
    emb = table[safe]
    return jnp.where((tokens >= cfg.vocab_size)[..., None], 0.0, emb)


def predictor_step(params, tokens, state, cfg: RNNTConfig):
    """One decode step.

    Args:
      tokens: [B] int32 previous token (blank_id for start-of-sequence)
      state: (h, c) each [L, B, H]

    Returns:
      (g [B, H] fp32, new_state)
    """
    dt = cfg.dtype
    if cfg.predictor_kind == "stateless":
        context = jnp.concatenate([state, tokens[:, None]], axis=1)  # [B, ctx]
        emb = _embed_tokens(params, context, cfg).astype(dt)  # [B, ctx, H]
        b = emb.shape[0]
        g = jax.nn.relu(dense(params["ctx_proj"], emb.reshape(b, -1), dtype=dt))
        return g.astype(jnp.float32), context[:, 1:]
    x = _embed_tokens(params, tokens, cfg).astype(dt)
    h, c = state
    hs, cs = [], []
    for li, layer in enumerate(params["lstm"]):
        h_new, c_new = _lstm_cell(layer, x, h[li], c[li])
        hs.append(h_new)
        cs.append(c_new)
        x = h_new.astype(dt)
    return x.astype(jnp.float32), (jnp.stack(hs), jnp.stack(cs))


def predictor_sequence(params, tokens, cfg: RNNTConfig, state=None):
    """Teacher-forced full-sequence prediction for training.

    Args:
      tokens: [B, U] int32 label sequence (no SOS; it's prepended internally)

    Returns:
      g: [B, U+1, H] — g[:, 0] is the SOS context output.
    """
    b, u = tokens.shape
    sos = jnp.full((b, 1), cfg.blank_id, tokens.dtype)
    inp = jnp.concatenate([sos, tokens], axis=1)  # [B, U+1]
    if state is None:
        state = predictor_zero_state(b, cfg)

    def step(carry, tok):
        g, new_state = predictor_step(params, tok, carry, cfg)
        return new_state, g

    _, gs = jax.lax.scan(step, state, inp.T)  # [U+1, B, H]
    return jnp.transpose(gs, (1, 0, 2))


# ---------------------------------------------------------------------------
# joint network
# ---------------------------------------------------------------------------


def _joint_act(x, cfg: RNNTConfig):
    if cfg.joint_activation == "relu":
        return jax.nn.relu(x)
    if cfg.joint_activation == "tanh":
        return jnp.tanh(x)
    if cfg.joint_activation == "sigmoid":
        return jax.nn.sigmoid(x)
    raise ValueError(cfg.joint_activation)


def joint_step(params, enc_frame, pred_out, cfg: RNNTConfig):
    """Pointwise joint for decode: enc_frame [B, E], pred_out [B, H] ->
    logits [B, vocab+1] fp32."""
    dt = cfg.dtype
    z = dense(params["enc"], enc_frame, dtype=dt) + dense(
        params["pred"], pred_out, dtype=dt
    )
    z = _joint_act(z, cfg)
    return dense(params["out"], z, dtype=dt).astype(jnp.float32)


def joint_precompute_enc(params, enc, cfg: RNNTConfig):
    """Hoist the encoder-side joint projection out of the decode loop:
    [B, T, E] -> [B, T, J] computed once per utterance (the decode loop then
    runs only the pred projection + output matmul per iteration)."""
    return dense(params["enc"], enc, dtype=cfg.dtype).astype(jnp.float32)


def joint_step_from_enc_proj(params, enc_proj_frame, pred_out, cfg: RNNTConfig):
    """joint_step with the enc projection already applied
    (enc_proj_frame [B, J])."""
    dt = cfg.dtype
    z = enc_proj_frame.astype(dt) + dense(params["pred"], pred_out, dtype=dt)
    z = _joint_act(z, cfg)
    return dense(params["out"], z, dtype=dt).astype(jnp.float32)


def joint_full(params, enc, pred, cfg: RNNTConfig):
    """Full lattice joint for the training loss.

    enc: [B, T, E], pred: [B, U1, H] -> logits [B, T, U1, vocab+1] fp32.
    Kept in bf16 through the hidden layer; the output cast is fp32 for the
    loss's log-softmax.
    """
    dt = cfg.dtype
    f = dense(params["enc"], enc, dtype=dt)  # [B, T, J]
    g = dense(params["pred"], pred, dtype=dt)  # [B, U1, J]
    z = _joint_act(f[:, :, None, :] + g[:, None, :, :], cfg)
    return dense(params["out"], z, dtype=dt).astype(jnp.float32)
