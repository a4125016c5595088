"""Streaming (cache-based) FastConformer inference.

The offline encoder is bidirectional; this module provides the
latency-bounded streaming mode SURVEY.md §5 plans ("a lax.scan streaming
encoder option with cached conv/attention context", cf. PAPERS.md: stateful
Conformer with cache-based inference, chunk-wise attention transducers):

- audio arrives in fixed mel chunks (``chunk_frames`` encoder frames after
  8× subsampling);
- each Conformer block attends over [left-context cache ‖ current chunk]
  keys (chunk-wise attention) and runs a CAUSAL depthwise conv fed by a
  per-layer conv cache;
- the subsampling stack sees a small mel-frame cache so chunk boundaries
  don't lose its receptive field;
- all caches are fixed-shape arrays: one ``streaming_step`` is a single
  jittable program, and ``streaming_encode`` drives a whole utterance under
  ``lax.scan`` (bit-identical to stepping, tested).

Streaming outputs deliberately differ from the offline encoder (no right
context); accuracy at a given latency is a property of streaming-trained
weights. The defining property — future audio cannot change past outputs —
is tested.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .fastconformer import (
    FastConformerConfig,
    _ffn,
    _sinusoid_rel_pos,
    _subsample,
)
from .layers import (
    batch_norm_infer,
    conv1d,
    dense,
    depthwise_conv1d,
    glu,
    layer_norm,
    swish,
)

__all__ = ["StreamingConfig", "streaming_init_state", "streaming_step", "streaming_encode"]


@dataclass(frozen=True)
class StreamingConfig:
    # encoder frames produced per step (x8 mel frames consumed): 16 -> 1.28 s
    chunk_frames: int = 16
    # encoder frames of attention left context kept per layer
    left_context: int = 64
    # mel frames of subsampling context (receptive field of the conv stack)
    sub_context: int = 16


def streaming_init_state(cfg: FastConformerConfig, scfg: StreamingConfig, batch: int):
    """Fresh streaming caches for a batch."""
    d = cfg.d_model
    k = cfg.conv_kernel
    n_layers = cfg.num_layers
    return {
        "mel_cache": jnp.zeros((batch, scfg.sub_context, cfg.feat_in), jnp.float32),
        # per-layer attention K/V caches hold the layer INPUT activations of
        # the last `left_context` encoder frames (projections recomputed —
        # keeps the cache layout independent of head packing)
        "x_cache": jnp.zeros((n_layers, batch, scfg.left_context, d), jnp.float32),
        # per-layer causal-conv cache (kernel-1 frames)
        "conv_cache": jnp.zeros((n_layers, batch, k - 1, d), jnp.float32),
        # frames seen so far (drives validity masks for the first chunks)
        "frames_seen": jnp.zeros((batch,), jnp.int32),
    }


def _streaming_attention(p, x, x_cache, cache_valid, cfg: FastConformerConfig):
    """Chunk-wise attention: queries = current chunk, keys/values =
    [cache ‖ chunk]. cache_valid: [B] number of valid cache frames."""
    b, c, d = x.shape
    l = x_cache.shape[1]
    h, dh = cfg.num_heads, cfg.head_dim
    dt = cfg.dtype

    y = layer_norm(p["attn_ln"], x).astype(dt)
    ycache = layer_norm(p["attn_ln"], x_cache).astype(dt)
    keys_in = jnp.concatenate([ycache, y], axis=1)  # [B, L+C, D]

    q = dense(p["attn_q"], y, dtype=dt).reshape(b, c, h, dh)
    k = dense(p["attn_k"], keys_in, dtype=dt).reshape(b, l + c, h, dh)
    v = dense(p["attn_v"], keys_in, dtype=dt).reshape(b, l + c, h, dh)

    qu = q + p["attn_bias_u"].astype(dt)
    qv = q + p["attn_bias_v"].astype(dt)

    ac = jnp.einsum("bqhd,bkhd->bhqk", qu, k, preferred_element_type=jnp.float32)

    # relative positions: query i (global L+i) vs key j -> offset (L+i) - j
    # table ordered [max_off ... -(C-1)]
    t_all = l + c
    pos_emb = _sinusoid_rel_pos(t_all, cfg.d_model)  # offsets T-1..-(T-1)
    pos = dense(p["attn_pos"], pos_emb, dtype=dt).reshape(-1, h, dh)
    bd_full = jnp.einsum("bqhd,ohd->bhqo", qv, pos, preferred_element_type=jnp.float32)
    # gather offsets: off(i, j) = (L + i) - j; table index = (T-1) - off
    qi = jnp.arange(c)[:, None]
    kj = jnp.arange(t_all)[None, :]
    idx = (t_all - 1) - ((l + qi) - kj)  # [C, L+C]
    bd = jnp.take_along_axis(
        bd_full, idx[None, None].repeat(b, 0).repeat(h, 1), axis=3
    )

    scores = (ac + bd) / np.sqrt(dh)
    # mask: cache frames beyond cache_valid (stored right-aligned) + causal
    # within the chunk (queries can't see future chunk frames)
    cache_ok = kj[None] >= (l - cache_valid[:, None, None])  # [B, 1, L+C]
    causal = kj[None] <= (l + qi)[None]  # [1, C, L+C]
    mask = cache_ok & causal & (kj[None] < t_all)
    scores = jnp.where(mask[:, None], scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(dt)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
    return dense(p["attn_out"], out.astype(dt).reshape(b, c, d), dtype=dt)


def _streaming_conv(p, x, conv_cache, cfg: FastConformerConfig):
    """Causal conv module: depthwise conv left-padded with the cache."""
    dt = cfg.dtype
    y = layer_norm(p["conv_ln"], x).astype(dt)
    y = conv1d(p["conv_in"], y, dtype=dt)
    y = glu(y, axis=-1)
    full = jnp.concatenate([conv_cache.astype(dt), y], axis=1)
    new_cache = full[:, -(cfg.conv_kernel - 1) :].astype(jnp.float32)
    y = depthwise_conv1d(p["conv_dw"], full, padding="VALID", dtype=dt)
    if cfg.conv_norm == "batch_norm":
        y = batch_norm_infer(p["conv_bn"], y).astype(dt)
    else:
        y = layer_norm(p["conv_bn"], y)
    y = swish(y)
    return conv1d(p["conv_out"], y, dtype=dt), new_cache


def _streaming_block(p, x, x_cache, conv_cache, cache_valid, cfg):
    x = x + 0.5 * _ffn(p, "ffn1", x, cfg)
    x = x + _streaming_attention(p, x, x_cache, cache_valid, cfg)
    conv_out, new_conv_cache = _streaming_conv(p, x, conv_cache, cfg)
    x = x + conv_out
    x = x + 0.5 * _ffn(p, "ffn2", x, cfg)
    return layer_norm(p["final_ln"], x), new_conv_cache


@partial(jax.jit, static_argnames=("cfg", "scfg"))
def streaming_step(params, state, mel_chunk, cfg: FastConformerConfig,
                   scfg: StreamingConfig):
    """Process one mel chunk.

    Args:
      state: caches from streaming_init_state / a previous step
      mel_chunk: [B, 8*chunk_frames, feat_in] log-mel frames (the frontend's
        per_feature normalization must be disabled or computed streaming-side)

    Returns:
      (enc_chunk [B, chunk_frames, d_model] fp32, new_state)
    """
    b = mel_chunk.shape[0]
    c = scfg.chunk_frames
    sub_in = jnp.concatenate([state["mel_cache"], mel_chunk.astype(jnp.float32)], axis=1)
    new_mel_cache = sub_in[:, -scfg.sub_context :]
    lengths = jnp.full((b,), sub_in.shape[1], jnp.int32)
    x, _ = _subsample(params["subsampling"], sub_in, lengths, cfg)
    x = x[:, -c:]  # keep the chunk's own encoder frames
    if cfg.xscaling:
        x = x * np.sqrt(cfg.d_model).astype(np.float32)
    x = x.astype(jnp.float32)

    cache_valid = jnp.minimum(state["frames_seen"], scfg.left_context)

    new_x_caches = []
    new_conv_caches = []
    n_layers = cfg.num_layers
    for li in range(n_layers):
        lp = jax.tree.map(lambda a: a[li], params["blocks"])
        x_cache = state["x_cache"][li]
        # the cache stores this layer's INPUT frames; update right-aligned
        new_x_caches.append(
            jnp.concatenate([x_cache, x], axis=1)[:, -scfg.left_context :]
        )
        x_new, new_conv = _streaming_block(
            lp, x.astype(jnp.float32), x_cache, state["conv_cache"][li],
            cache_valid, cfg,
        )
        new_conv_caches.append(new_conv)
        x = x_new.astype(jnp.float32)

    new_state = {
        "mel_cache": new_mel_cache,
        "x_cache": jnp.stack(new_x_caches),
        "conv_cache": jnp.stack(new_conv_caches),
        "frames_seen": state["frames_seen"] + c,
    }
    if cfg.final_norm:
        from .layers import layer_norm

        x = layer_norm(params["after_norm"], x)
    return x, new_state


def streaming_encode(params, feats, cfg: FastConformerConfig,
                     scfg: StreamingConfig = StreamingConfig()):
    """Encode a whole utterance chunk-by-chunk under lax.scan (bit-identical
    to repeated streaming_step calls; useful for simulating streaming and for
    O(T·L) long-form encoding).

    feats: [B, T_mel, feat_in]; T_mel is truncated to a multiple of
    8·chunk_frames. Returns [B, T_enc, d_model].
    """
    b, t_mel, f = feats.shape
    mel_per_chunk = 8 * scfg.chunk_frames
    n_chunks = t_mel // mel_per_chunk
    feats = feats[:, : n_chunks * mel_per_chunk]
    chunks = feats.reshape(b, n_chunks, mel_per_chunk, f).transpose(1, 0, 2, 3)

    state = streaming_init_state(cfg, scfg, b)

    def body(carry, chunk):
        out, new_state = streaming_step(params, carry, chunk, cfg, scfg)
        return new_state, out

    _, outs = jax.lax.scan(body, state, chunks)  # [N, B, C, D]
    return jnp.transpose(outs, (1, 0, 2, 3)).reshape(b, -1, cfg.d_model)
