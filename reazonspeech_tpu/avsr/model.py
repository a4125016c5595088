"""AVHuBERT encoder + seq2seq decoder (JAX), with greedy/beam generation.

Architecture parity with the reference models (pkg/avsr/src/avhubert/
modeling_avhubert.py:40-391, decoder.py:47-1102):

- AudioFeatureExtractor: one Linear 104→hidden;
- VideoFeatureExtractor: ResNet3D trunk + Linear 512→hidden;
- missing modality substituted with zeros; fusion by feature concat or add;
- layer_norm → post-extract projection → HuBERT-style transformer encoder
  (conv positional embedding, pre-LN "StableLayerNorm" blocks);
- decoder: token embedding (×√d), sinusoidal positions, pre-LN blocks with
  causal self-attention + cross-attention, tied lm_head;
- generation: greedy and beam search as single lax.while_loop programs with
  fixed-shape KV caches (replacing HF GenerationMixin's Python loop and
  EncoderDecoderCache, reference decoder.py:151-278).
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import (
    dense,
    dense_init,
    depthwise_conv1d,
    depthwise_conv1d_init,
    embedding_init,
    layer_norm,
    layer_norm_init,
)
from .configuration_avhubert import AVHubertConfig
from .resnet3d import RESNET_OUT_DIM, init_resnet3d, resnet3d_apply

__all__ = ["AVHubertModel", "AVHubertForConditionalGeneration"]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _attn_init(key, d, heads, kv_dim=None):
    kv_dim = kv_dim or d
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "q": dense_init(k1, d, d),
        "k": dense_init(k2, kv_dim, d),
        "v": dense_init(k3, kv_dim, d),
        "out": dense_init(k4, d, d),
    }


def _enc_layer_init(key, cfg: AVHubertConfig):
    d, ffn = cfg.hidden_size, cfg.intermediate_size
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "attn_ln": layer_norm_init(d),
        "attn": _attn_init(k1, d, cfg.num_attention_heads),
        "ffn_ln": layer_norm_init(d),
        "ffn_in": dense_init(k2, d, ffn),
        "ffn_out": dense_init(k3, ffn, d),
    }


def _dec_layer_init(key, cfg: AVHubertConfig):
    d, ffn = cfg.decoder_hidden_size, cfg.decoder_ffn_dim
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "self_ln": layer_norm_init(d),
        "self_attn": _attn_init(k1, d, cfg.decoder_attention_heads),
        "cross_ln": layer_norm_init(d),
        "cross_attn": _attn_init(k2, d, cfg.decoder_attention_heads, cfg.hidden_size),
        "ffn_ln": layer_norm_init(d),
        "ffn_in": dense_init(k3, d, ffn),
        "ffn_out": dense_init(k4, ffn, d),
    }


def init_avhubert(key, cfg: AVHubertConfig):
    keys = iter(jax.random.split(key, 12 + cfg.num_hidden_layers + cfg.decoder_layers))
    d = cfg.hidden_size

    p = {
        "audio_proj": dense_init(next(keys), cfg.audio_feat_dim, d),
        "video_resnet": init_resnet3d(next(keys), cfg.resnet_relu_type),
        "video_proj": dense_init(next(keys), RESNET_OUT_DIM, d),
        "fuse_ln": layer_norm_init(cfg.fused_dim),
        "conv_pos": _conv_pos_init(
            next(keys), d, cfg.num_conv_pos_embeddings,
            cfg.num_conv_pos_embedding_groups,
        ),
        "enc_final_ln": layer_norm_init(d),
    }
    if cfg.fused_dim != d:
        p["post_proj"] = dense_init(next(keys), cfg.fused_dim, d)

    enc_layers = [_enc_layer_init(next(keys), cfg) for _ in range(cfg.num_hidden_layers)]
    p["enc_layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *enc_layers)

    dd = cfg.decoder_hidden_size
    p["embed_tokens"] = embedding_init(next(keys), cfg.vocab_size, dd, scale=0.02)
    dec_layers = [_dec_layer_init(next(keys), cfg) for _ in range(cfg.decoder_layers)]
    p["dec_layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *dec_layers)
    p["dec_final_ln"] = layer_norm_init(dd)
    if not cfg.tie_word_embeddings:
        p["lm_head"] = dense_init(next(keys), dd, cfg.vocab_size, bias=False)
    if cfg.ctc_loss_weight > 0:
        # auxiliary CTC head over encoder frames (reference trains with
        # ctc_loss_weight=0.3, configuration_avhubert.py:54)
        p["ctc_head"] = dense_init(next(keys), d, cfg.vocab_size + 1)
    return p


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


def _mha(p, q_in, kv_in, heads, mask=None, dtype=jnp.float32):
    """q_in: [B, Tq, D], kv_in: [B, Tk, Dkv], mask: broadcastable [B, Tq, Tk]."""
    b, tq, d = q_in.shape
    dh = d // heads
    q = dense(p["q"], q_in, dtype=dtype).reshape(b, tq, heads, dh)
    k = dense(p["k"], kv_in, dtype=dtype).reshape(b, -1, heads, dh)
    v = dense(p["v"], kv_in, dtype=dtype).reshape(b, -1, heads, dh)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / np.sqrt(dh)
    if mask is not None:
        scores = jnp.where(mask[:, None], scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
    return dense(p["out"], out.astype(dtype).reshape(b, tq, d), dtype=dtype)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _conv_pos_init(key, d, kernel, groups):
    k1, k2 = jax.random.split(key)
    scale = 1.0 / np.sqrt(kernel * d / groups)
    w = jax.random.uniform(k1, (kernel, d // groups, d), jnp.float32, -scale, scale)
    b = jax.random.uniform(k2, (d,), jnp.float32, -scale, scale)
    return {"w": w, "b": b}


def _conv_pos_embed(p, x, groups, dtype):
    """HubertPositionalConvEmbedding: grouped Conv1d with padding K//2 and
    the even-kernel trailing-frame trim (HubertSamePadLayer)."""
    w = p["w"]  # [K, in/groups, out]
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        w.astype(dtype),
        window_strides=(1,),
        padding=[(k // 2, k // 2)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    if k % 2 == 0:
        y = y[:, :-1]
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _sinusoid_pos(t, d):
    pos = np.arange(t, dtype=np.float64)
    half = d // 2
    inv = np.exp(np.arange(half, dtype=np.float64) * (-np.log(10000.0) / max(half - 1, 1)))
    ang = pos[:, None] * inv[None, :]
    pe = np.zeros((t, d), np.float32)
    pe[:, 0:half] = np.sin(ang)
    pe[:, half : 2 * half] = np.cos(ang)
    return jnp.asarray(pe)


def encode(params, cfg: AVHubertConfig, audio=None, video=None, lengths=None,
           dtype=jnp.float32):
    """Fuse modalities and run the transformer encoder.

    Args:
      audio: [B, T, audio_feat_dim] or None
      video: [B, T, H, W] grayscale or None (missing modality -> zeros,
        reference modeling_avhubert.py:170-180)
      lengths: [B] valid frame counts (defaults to full)

    Returns:
      (hidden [B, T, hidden], mask [B, T])
    """
    if audio is None and video is None:
        raise ValueError("at least one of audio/video is required")

    feats = []
    if audio is not None:
        a = dense(params["audio_proj"], audio.astype(dtype), dtype=dtype)
    if video is not None:
        vfeat = resnet3d_apply(params["video_resnet"], video, dtype=dtype)
        v = dense(params["video_proj"], vfeat.astype(dtype), dtype=dtype)
    if audio is None:
        a = jnp.zeros_like(v)
    if video is None:
        v = jnp.zeros_like(a)

    if cfg.modality_fuse == "concat":
        x = jnp.concatenate([a, v], axis=-1)
    else:
        x = a + v

    x = layer_norm(params["fuse_ln"], x)
    if "post_proj" in params:
        x = dense(params["post_proj"], x.astype(dtype), dtype=dtype)

    b, t, d = x.shape
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    mask = jnp.arange(t)[None, :] < lengths[:, None]
    x = jnp.where(mask[..., None], x, 0)

    # HuBERT conv positional embedding: GROUPED conv (exact semantics of
    # HubertPositionalConvEmbedding: pad K//2 both sides, drop the trailing
    # frame for even K, GELU) — the round-1 depthwise approximation would
    # have been wrong for real weights
    pos = _conv_pos_embed(
        params["conv_pos"], x, cfg.num_conv_pos_embedding_groups, dtype
    )
    x = x + jax.nn.gelu(pos)

    heads = cfg.num_attention_heads
    attn_mask = mask[:, None, :]  # [B, 1(Tq), Tk]

    def body(carry, lp):
        h = carry
        y = layer_norm(lp["attn_ln"], h).astype(dtype)
        h = h + _mha(lp["attn"], y, y, heads, attn_mask, dtype)
        y = layer_norm(lp["ffn_ln"], h).astype(dtype)
        y = dense(lp["ffn_out"], jax.nn.gelu(dense(lp["ffn_in"], y, dtype=dtype)), dtype=dtype)
        h = h + y
        return jnp.where(mask[..., None], h, 0).astype(jnp.float32), None

    x, _ = jax.lax.scan(body, x.astype(jnp.float32), params["enc_layers"])
    x = layer_norm(params["enc_final_ln"], x)
    return x, mask


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _dec_layer(lp, h, enc, enc_mask, self_mask, heads, dtype):
    y = layer_norm(lp["self_ln"], h).astype(dtype)
    h = h + _mha(lp["self_attn"], y, y, heads, self_mask, dtype)
    y = layer_norm(lp["cross_ln"], h).astype(dtype)
    h = h + _mha(lp["cross_attn"], y, enc, heads, enc_mask, dtype)
    y = layer_norm(lp["ffn_ln"], h).astype(dtype)
    y = dense(lp["ffn_out"], jax.nn.gelu(dense(lp["ffn_in"], y, dtype=dtype)), dtype=dtype)
    return h + y


def decode_logits(params, cfg: AVHubertConfig, tokens, enc, enc_mask,
                  dtype=jnp.float32):
    """Teacher-forced decoder: tokens [B, U] -> logits [B, U, vocab]."""
    b, u = tokens.shape
    dd = cfg.decoder_hidden_size
    emb = params["embed_tokens"]["table"][tokens] * np.sqrt(dd)
    x = emb + _sinusoid_pos(u, dd)[None]

    causal = jnp.tril(jnp.ones((u, u), bool))[None]  # [1, U, U]
    cross_mask = enc_mask[:, None, :]

    heads = cfg.decoder_attention_heads
    h = x.astype(jnp.float32)
    layers = params["dec_layers"]

    def body(carry, lp):
        return (
            _dec_layer(lp, carry, enc, cross_mask, causal, heads, dtype).astype(
                jnp.float32
            ),
            None,
        )

    h, _ = jax.lax.scan(body, h, layers)
    h = layer_norm(params["dec_final_ln"], h)
    return _lm_head(params, cfg, h, dtype)


def _lm_head(params, cfg, h, dtype):
    if cfg.tie_word_embeddings:
        w = params["embed_tokens"]["table"].T
        return (h.astype(dtype) @ w.astype(dtype)).astype(jnp.float32)
    return dense(params["lm_head"], h, dtype=dtype).astype(jnp.float32)


# ---------------------------------------------------------------------------
# generation (greedy + beam) as fixed-shape while_loops
# ---------------------------------------------------------------------------


def _decode_step(params, cfg, tok, pos, caches, enc, enc_mask, dtype):
    """One decoder step with KV caches.

    tok: [B] current token; pos: scalar step index; caches: per-layer
    (k, v) arrays [L, B, max_len, D]. Returns (logits [B, vocab], caches).
    """
    dd = cfg.decoder_hidden_size
    heads = cfg.decoder_attention_heads
    dh = dd // heads
    b = tok.shape[0]
    max_len = caches[0].shape[2]

    x = params["embed_tokens"]["table"][tok] * np.sqrt(dd)
    x = x + _sinusoid_pos(max_len, dd)[pos]
    h = x.astype(jnp.float32)[:, None, :]  # [B, 1, D]

    kc, vc = caches
    new_kc, new_vc = [], []
    valid = jnp.arange(max_len)[None, None, :] <= pos  # [1, 1, max_len]
    cross_mask = enc_mask[:, None, :]

    n_layers = kc.shape[0]
    for li in range(n_layers):
        lp = jax.tree.map(lambda x: x[li], params["dec_layers"])
        y = layer_norm(lp["self_ln"], h).astype(dtype)
        k_new = dense(lp["self_attn"]["k"], y, dtype=dtype)[:, 0]  # [B, D]
        v_new = dense(lp["self_attn"]["v"], y, dtype=dtype)[:, 0]
        k_cache = jax.lax.dynamic_update_index_in_dim(kc[li], k_new, pos, axis=1)
        v_cache = jax.lax.dynamic_update_index_in_dim(vc[li], v_new, pos, axis=1)
        new_kc.append(k_cache)
        new_vc.append(v_cache)

        q = dense(lp["self_attn"]["q"], y, dtype=dtype).reshape(b, 1, heads, dh)
        kk = k_cache.reshape(b, max_len, heads, dh)
        vv = v_cache.reshape(b, max_len, heads, dh)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, kk.astype(dtype), preferred_element_type=jnp.float32
        ) / np.sqrt(dh)
        scores = jnp.where(valid[:, None], scores, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        attn = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, vv.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        h = h + dense(
            lp["self_attn"]["out"], attn.astype(dtype).reshape(b, 1, dd), dtype=dtype
        )

        y = layer_norm(lp["cross_ln"], h).astype(dtype)
        h = h + _mha(lp["cross_attn"], y, enc, heads, cross_mask, dtype)
        y = layer_norm(lp["ffn_ln"], h).astype(dtype)
        y = dense(lp["ffn_out"], jax.nn.gelu(dense(lp["ffn_in"], y, dtype=dtype)), dtype=dtype)
        h = h + y

    h = layer_norm(params["dec_final_ln"], h)
    logits = _lm_head(params, cfg, h, dtype)[:, 0]
    return logits, (jnp.stack(new_kc), jnp.stack(new_vc))


def greedy_generate(params, cfg: AVHubertConfig, enc, enc_mask, max_length=128,
                    dtype=jnp.float32):
    """[B] greedy decode. Returns tokens [B, max_length] (eos-padded)."""
    b = enc.shape[0]
    dd = cfg.decoder_hidden_size
    n_layers = cfg.decoder_layers

    kc = jnp.zeros((n_layers, b, max_length, dd), dtype)
    vc = jnp.zeros((n_layers, b, max_length, dd), dtype)
    tokens = jnp.full((b, max_length), cfg.eos_token_id, jnp.int32)
    cur = jnp.full((b,), cfg.bos_token_id, jnp.int32)
    done = jnp.zeros((b,), bool)

    def cond(state):
        pos, _, _, done, _ = state
        return (pos < max_length) & ~jnp.all(done)

    def body(state):
        pos, cur, caches, done, tokens = state
        logits, caches = _decode_step(
            params, cfg, cur, pos, caches, enc, enc_mask, dtype
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.eos_token_id, nxt)
        tokens = jax.lax.dynamic_update_index_in_dim(tokens, nxt, pos, axis=1)
        done = done | (nxt == cfg.eos_token_id)
        return (pos + 1, nxt, caches, done, tokens)

    _, _, _, _, tokens = jax.lax.while_loop(
        cond, body, (jnp.int32(0), cur, (kc, vc), done, tokens)
    )
    return tokens


def beam_generate(params, cfg: AVHubertConfig, enc, enc_mask, num_beams=5,
                  max_length=128, length_penalty=1.0, dtype=jnp.float32):
    """Beam search with HF ``BeamSearchScorer`` semantics (the reference's
    ``generate(num_beams=5)``, modeling_avhubert.py:330-370 + transformers
    beam_search; gated token-for-token against
    tools/torch_reference.py:avhubert_beam_reference):

    - per step the top 2·beam candidates are processed in rank order; an EOS
      candidate (rank < beam only) banks its running hypothesis into a
      worst-replaced pool of size ``beam`` scored
      ``sum_logprobs / len^length_penalty`` (len counts the decoder-start
      token, not the EOS); the first ``beam`` non-EOS candidates become the
      next beams;
    - early_stopping=False: a batch element finishes when its pool is full
      and the worst pooled score beats best_candidate/(cur_len+1)^penalty,
      else at ``max_length`` generated tokens, where the surviving beams are
      banked too.

    Returns the best hypothesis's generated tokens [B, max_length]
    (eos-padded; no leading bos)."""
    b, t_enc, d_enc = enc.shape
    k = num_beams
    vocab = cfg.vocab_size
    dd = cfg.decoder_hidden_size
    n_layers = cfg.decoder_layers
    eos = cfg.eos_token_id
    neg = jnp.float32(-1e9)
    bi = jnp.arange(b)

    enc_x = jnp.repeat(enc, k, axis=0)
    mask_x = jnp.repeat(enc_mask, k, axis=0)

    kc = jnp.zeros((n_layers, b * k, max_length, dd), dtype)
    vc = jnp.zeros((n_layers, b * k, max_length, dd), dtype)
    tokens = jnp.full((b, k, max_length), eos, jnp.int32)
    scores = jnp.tile(jnp.array([0.0] + [-1e9] * (k - 1), jnp.float32), (b, 1))
    cur = jnp.full((b * k,), cfg.bos_token_id, jnp.int32)
    done = jnp.zeros((b,), bool)

    pool_norm = jnp.full((b, k), neg)
    pool_tokens = jnp.full((b, k, max_length), eos, jnp.int32)
    pool_count = jnp.zeros((b, k), jnp.int32)  # generated tokens banked
    pool_eos = jnp.zeros((b, k), bool)

    def pool_insert(pool, ins, cand_norm, cand_tokens, cand_count, cand_eos):
        """HF BeamHypotheses.add: replace the worst slot when better (empty
        slots are -1e9 and always lose). ``ins`` masks per batch element."""
        pn, pt, pc, pe = pool
        worst = jnp.argmin(pn, axis=1)  # [B]
        do = ins & (cand_norm > pn[bi, worst])
        # masked scatter: write only where do
        pn = pn.at[bi, worst].set(jnp.where(do, cand_norm, pn[bi, worst]))
        pt = pt.at[bi, worst].set(
            jnp.where(do[:, None], cand_tokens, pt[bi, worst]))
        pc = pc.at[bi, worst].set(jnp.where(do, cand_count, pc[bi, worst]))
        pe = pe.at[bi, worst].set(jnp.where(do, cand_eos, pe[bi, worst]))
        return (pn, pt, pc, pe)

    def cond(state):
        pos, done = state[0], state[5]
        return (pos < max_length) & ~jnp.all(done)

    def body(state):
        (pos, cur, caches, scores, tokens, done,
         pool_norm, pool_tokens, pool_count, pool_eos) = state
        logits, new_caches = _decode_step(
            params, cfg, cur, pos, caches, enc_x, mask_x, dtype
        )
        logp = jax.nn.log_softmax(logits, axis=-1).reshape(b, k, vocab)

        cand = scores[..., None] + logp  # [B, k, V]
        vals, idx = jax.lax.top_k(cand.reshape(b, k * vocab), 2 * k)
        src = idx // vocab
        tok = (idx % vocab).astype(jnp.int32)
        is_eos = tok == eos

        # --- bank EOS candidates of rank < k (sequential worst-replacement,
        # exactly HF's in-order adds) ---------------------------------------
        pool = (pool_norm, pool_tokens, pool_count, pool_eos)
        hyp_len = (pos + 1).astype(jnp.float32)  # incl decoder-start
        for r in range(k):
            ins = ~done & is_eos[:, r]
            norm_r = vals[:, r] / jnp.power(hyp_len, length_penalty)
            cand_tokens = tokens[bi, src[:, r]]  # [B, U] (no new token)
            pool = pool_insert(pool, ins, norm_r, cand_tokens, pos, True)
        pool_norm, pool_tokens, pool_count, pool_eos = pool

        # --- next beams: first k non-EOS candidates in rank order ----------
        keep = ~is_eos  # [B, 2k]
        slot = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1  # target slot
        valid = keep & (slot < k)
        slot_w = jnp.where(valid, slot, k)  # k = scratch column
        new_scores = jnp.full((b, k + 1), neg)
        new_src = jnp.zeros((b, k + 1), jnp.int32)
        new_tok = jnp.full((b, k + 1), eos, jnp.int32)
        new_scores = new_scores.at[bi[:, None], slot_w].set(
            jnp.where(valid, vals, neg))
        new_src = new_src.at[bi[:, None], slot_w].set(jnp.where(valid, src, 0))
        new_tok = new_tok.at[bi[:, None], slot_w].set(
            jnp.where(valid, tok, eos))
        new_scores, new_src, new_tok = (
            new_scores[:, :k], new_src[:, :k], new_tok[:, :k])

        # --- reorder beam state, append the new token ----------------------
        gflat = (new_src + bi[:, None] * k).reshape(-1)
        new_caches = (new_caches[0][:, gflat], new_caches[1][:, gflat])
        new_tokens = jnp.take_along_axis(tokens, new_src[..., None], axis=1)
        new_tokens = jax.lax.dynamic_update_index_in_dim(
            new_tokens, new_tok, pos, axis=2)

        # --- is_done (early_stopping=False) --------------------------------
        pool_full = jnp.sum(pool_norm > neg / 2, axis=1) >= k
        worst = jnp.min(pool_norm, axis=1)
        cur_len = (pos + 2).astype(jnp.float32)
        done_now = pool_full & (
            worst >= vals[:, 0] / jnp.power(cur_len, length_penalty))
        new_done = done | done_now

        # freeze finished elements. The KV caches are deliberately NOT
        # frozen: ``done`` is monotone and a done element's cache only
        # feeds logits whose every consumer (scores/tokens/pool inserts)
        # is already done-masked, so letting its rows go stale is exact —
        # and the old freeze select rewrote the full [L, B*k, T, D] cache
        # pair every step (~380 MB/step at the serving config), the same
        # whole-arena-rewrite pathology the Graves beam restructure removed
        # (BENCHMARKS.md round-3 notes).
        fz = lambda new, old: jnp.where(
            done.reshape((b,) + (1,) * (new.ndim - 1)), old, new)
        scores = fz(new_scores, scores)
        tokens = fz(new_tokens, tokens)
        caches = new_caches
        cur = jnp.where(jnp.repeat(done, k), cur, new_tok.reshape(-1))

        return (pos + 1, cur, caches, scores, tokens, new_done,
                pool_norm, pool_tokens, pool_count, pool_eos)

    state = (jnp.int32(0), cur, (kc, vc), scores, tokens, done,
             pool_norm, pool_tokens, pool_count, pool_eos)
    (pos, _, _, scores, tokens, done,
     pool_norm, pool_tokens, pool_count, pool_eos) = jax.lax.while_loop(
        cond, body, state)

    # finalize: batches that hit max_length bank their surviving beams
    pool = (pool_norm, pool_tokens, pool_count, pool_eos)
    fin_len = (pos + 1).astype(jnp.float32)
    for i in range(k):
        norm_i = scores[:, i] / jnp.power(fin_len, length_penalty)
        pool = pool_insert(pool, ~done, norm_i, tokens[:, i], pos, False)
    pool_norm, pool_tokens, pool_count, pool_eos = pool

    best = jnp.argmax(pool_norm, axis=1)
    out = pool_tokens[bi, best]
    cnt = pool_count[bi, best]
    # eos-pad beyond the hypothesis (HF appends eos when one was emitted;
    # the buffer is eos-padded either way, callers stop at the first eos)
    out = jnp.where(jnp.arange(max_length)[None, :] < cnt[:, None], out, eos)
    return out


# ---------------------------------------------------------------------------
# user-facing wrappers
# ---------------------------------------------------------------------------


def _load_pretrained(cls, path, config=None):
    """Shared loader: a native param tree (.npz/.json from convert.store) or
    an HF checkpoint directory (config.json + safetensors/bin, converted on
    the fly)."""
    import os
    import tempfile

    if os.path.isdir(path):
        from ..convert.hf_avhubert import convert_avhubert_checkpoint

        with tempfile.TemporaryDirectory() as td:
            params, cfg = convert_avhubert_checkpoint(
                path, os.path.join(td, "tree"), cfg=config
            )
        return cls(config=cfg, params=jax.tree.map(jnp.asarray, params))

    from ..convert.store import load_param_tree

    params, meta = load_param_tree(path)
    if config is None:
        cfg_dict = meta.get("cfg", {})
        config = AVHubertConfig(**cfg_dict) if cfg_dict else AVHubertConfig()
    return cls(config=config, params=jax.tree.map(jnp.asarray, params))


@dataclass
class AVHubertModel:
    """Encoder-only model (feature fusion + transformer)."""

    config: AVHubertConfig
    params: dict

    @classmethod
    def init(cls, key, config: AVHubertConfig):
        return cls(config=config, params=init_avhubert(key, config))

    @classmethod
    def from_pretrained(cls, path, config: AVHubertConfig = None):
        return _load_pretrained(cls, path, config)

    def __call__(self, audio=None, video=None, lengths=None):
        audio = jnp.asarray(audio) if audio is not None else None
        video = jnp.asarray(video) if video is not None else None
        cache = self.__dict__.setdefault("_jit_cache", {})
        fn = cache.get("encode")
        if fn is None:
            fn = jax.jit(partial(encode, cfg=self.config))
            cache["encode"] = fn
        return fn(self.params, audio=audio, video=video, lengths=lengths)


@dataclass
class AVHubertForConditionalGeneration:
    """Seq2seq model with generate().

    The compute methods route through per-instance cached ``jax.jit``
    wrappers: the encode + fixed-shape generate loop compile to ONE device
    program (eager execution would pay a host->device dispatch per
    primitive — catastrophic behind a tunneled TPU)."""

    config: AVHubertConfig
    params: dict

    def _jitted(self, key, build):
        cache = self.__dict__.setdefault("_jit_cache", {})
        fn = cache.get(key)
        if fn is None:
            fn = jax.jit(build())
            cache[key] = fn
        return fn

    @classmethod
    def init(cls, key, config: AVHubertConfig):
        if config.vocab_size is None:
            raise ValueError(
                "AVHubertForConditionalGeneration requires config.vocab_size"
            )
        return cls(config=config, params=init_avhubert(key, config))

    @classmethod
    def from_pretrained(cls, path, config: AVHubertConfig = None):
        """Load from a native param tree or an HF checkpoint directory
        (see _load_pretrained)."""
        return _load_pretrained(cls, path, config)

    def encoder(self, audio=None, video=None, lengths=None):
        fn = self._jitted("encode", lambda: partial(encode, cfg=self.config))
        return fn(self.params, audio=audio, video=video, lengths=lengths)

    def forward_logits(self, decoder_input_ids, audio=None, video=None, lengths=None):
        def build():
            def f(params, ids, audio, video, lengths):
                enc, mask = encode(params, self.config, audio, video, lengths)
                return decode_logits(params, self.config, ids, enc, mask)
            return f
        fn = self._jitted("forward_logits", build)
        return fn(self.params, jnp.asarray(decoder_input_ids), audio, video,
                  lengths)

    def loss(self, decoder_input_ids, labels, audio=None, video=None, lengths=None):
        """Label-smoothed cross-entropy (reference modeling_avhubert.py:314-316),
        plus the auxiliary encoder CTC term weighted by config.ctc_loss_weight
        when a ctc_head is present."""
        enc, mask = self.encoder(audio, video, lengths)
        logits = decode_logits(
            self.params, self.config, jnp.asarray(decoder_input_ids), enc, mask
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        eps = self.config.label_smoothing
        lbl = jnp.asarray(labels)
        nll = -jnp.take_along_axis(logp, lbl[..., None], axis=-1)[..., 0]
        smooth = -logp.mean(axis=-1)
        ce = (1 - eps) * nll + eps * smooth
        pad_mask = lbl != self.config.pad_token_id
        loss = (ce * pad_mask).sum() / jnp.maximum(pad_mask.sum(), 1)

        w = self.config.ctc_loss_weight
        if w > 0 and "ctc_head" in self.params:
            from ..models.layers import dense
            from ..training.losses import ctc_loss

            ctc_logits = dense(self.params["ctc_head"], enc).astype(jnp.float32)
            enc_lens = mask.sum(axis=-1).astype(jnp.int32)
            lbl_lens = pad_mask.sum(axis=-1).astype(jnp.int32)
            blank_id = self.config.vocab_size  # extra last logit
            c = jnp.mean(
                ctc_loss(ctc_logits, enc_lens, lbl, lbl_lens, blank_id)
            )
            loss = (1 - w) * loss + w * c
        return loss

    def generate(self, audio=None, video=None, lengths=None, num_beams=5,
                 max_length=128):
        def build():
            def f(params, audio, video, lengths):
                enc, mask = encode(params, self.config, audio, video, lengths)
                if num_beams <= 1:
                    return greedy_generate(params, self.config, enc, mask,
                                           max_length)
                return beam_generate(params, self.config, enc, mask,
                                     num_beams, max_length)
            return f
        fn = self._jitted(("generate", num_beams, max_length), build)
        return fn(self.params, audio, video, lengths)
