"""Batched greedy transducer decoding as an on-device loop.

Replaces NeMo's ALSD/greedy RNNT search and sherpa-onnx's C++ greedy search
(SURVEY.md §2.2) with a label-looping decode: one ``lax.while_loop`` where each
iteration advances every batch element either by one time frame (blank) or
one emitted label (non-blank). Total joint evaluations are T + U per sequence
— not T × max_symbols as a naive frame-inner-loop port would cost — and all
state lives in fixed-shape on-device buffers.

Emitted (token, frame) pairs preserve the frame-index timestamp semantics the
reference's decode math depends on (pkg/nemo-asr/src/decode.py:44-49): the
``frames`` output holds the encoder frame index (0.08 s grid) at which each
token was emitted.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..models.rnnt import (
    RNNTConfig,
    joint_precompute_enc,
    joint_step_from_enc_proj,
    predictor_step,
    predictor_zero_state,
)

__all__ = ["GreedyDecodeConfig", "rnnt_greedy_decode"]


@dataclass(frozen=True)
class GreedyDecodeConfig:
    # Cap on symbols emitted at one encoder frame before the decoder is
    # forced to advance (NeMo greedy uses the same guard, default 10).
    max_symbols_per_step: int = 10
    # Output buffer length as a fraction of T; Japanese RNN-T emits well
    # under 1 token per 80 ms frame, so T is a safe default cap.
    max_tokens: int = 0  # 0 -> use T
    # Blank-run skipping: evaluate the joint over a window of this many
    # frames per loop iteration and jump over the leading run of blanks in
    # one step. Algorithmically identical to frame_window=1 (blanks never
    # change the prediction-network state); outputs agree exactly up to
    # matmul reassociation — the [B,W,J] joint can round differently from
    # the [B,J] one, which only matters for near-tie argmaxes (random
    # weights), not trained logit margins. Trades W× joint work per
    # iteration for ~(T·blank_fraction) fewer iterations: on-chip, the
    # all-blank decode halves (19→9 ms at B=128×376 frames, window 4-8)
    # while the all-emissions worst case is unchanged at window 4 — the
    # default stays 1 so the benchmark keeps its worst-case semantics.
    frame_window: int = 1


@partial(jax.jit, static_argnames=("rnnt_cfg", "decode_cfg"))
def rnnt_greedy_decode(
    pred_params,
    joint_params,
    enc,
    enc_lengths,
    rnnt_cfg: RNNTConfig,
    decode_cfg: GreedyDecodeConfig = GreedyDecodeConfig(),
):
    """Greedy decode a batch of encoded utterances.

    Args:
      enc: [B, T, E] fp32 encoder output
      enc_lengths: [B] int32 valid frame counts

    Returns:
      tokens: [B, U] int32 emitted token ids (padded with blank_id)
      frames: [B, U] int32 encoder frame index of each emission
      counts: [B] int32 number of valid emissions per element
    """
    b, t, _ = enc.shape
    blank = rnnt_cfg.blank_id
    u_max = decode_cfg.max_tokens or t
    # per-element emission cap tied to the VALID length, so results are
    # invariant to how much the batch was padded (an utterance cannot emit
    # more than max_symbols_per_step per valid frame)
    emit_cap = jnp.minimum(
        u_max, enc_lengths * decode_cfg.max_symbols_per_step
    ).astype(jnp.int32)
    # encoder-side joint projection hoisted out of the loop: [B, T, J]
    enc_proj = joint_precompute_enc(joint_params, enc, rnnt_cfg)

    tokens = jnp.full((b, u_max), blank, jnp.int32)
    frames = jnp.zeros((b, u_max), jnp.int32)
    counts = jnp.zeros((b,), jnp.int32)
    time_idx = jnp.zeros((b,), jnp.int32)
    sym_at_frame = jnp.zeros((b,), jnp.int32)
    last_tok = jnp.full((b,), blank, jnp.int32)
    pred_state = predictor_zero_state(b, rnnt_cfg)
    # prediction-network output for the current context (SOS at start)
    pred_out, pred_state = predictor_step(pred_params, last_tok, pred_state, rnnt_cfg)

    def cond(state):
        time_idx, counts = state[3], state[2]
        return jnp.any((time_idx < enc_lengths) & (counts < emit_cap))

    w = max(int(decode_cfg.frame_window), 1)

    def body(state):
        tokens, frames, counts, time_idx, sym_at_frame, last_tok, pred_out, pred_state = state

        active = (time_idx < enc_lengths) & (counts < emit_cap)
        force_advance = sym_at_frame >= decode_cfg.max_symbols_per_step

        if w == 1:
            safe_t = jnp.minimum(time_idx, t - 1)
            enc_frame = jnp.take_along_axis(
                enc_proj, safe_t[:, None, None], axis=1
            )[:, 0]
            logits = joint_step_from_enc_proj(
                joint_params, enc_frame, pred_out, rnnt_cfg
            )
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            is_blank = (tok == blank) | force_advance
            emit = active & ~is_blank
            advance_n = (active & is_blank).astype(jnp.int32)
        else:
            # blank-run skipping: joint over a W-frame window against the
            # CURRENT prediction-network output (blanks don't change it, so
            # jumping the leading blank run at once is bit-exact), then
            # advance by the run length in one iteration.
            idx = jnp.minimum(
                time_idx[:, None] + jnp.arange(w)[None, :], t - 1
            )  # [B, W]
            enc_frames = jnp.take_along_axis(
                enc_proj, idx[:, :, None], axis=1
            )  # [B, W, J]
            logits = joint_step_from_enc_proj(
                joint_params, enc_frames, pred_out[:, None, :], rnnt_cfg
            )  # [B, W, V]
            tok_w = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            tok = tok_w[:, 0]
            in_range = (time_idx[:, None] + jnp.arange(w)[None, :]) < enc_lengths[
                :, None
            ]
            blank_w = (tok_w == blank) | ~in_range  # past-end counts as blank
            blank_w = blank_w.at[:, 0].set(blank_w[:, 0] | force_advance)
            lead = jnp.sum(
                jnp.cumprod(blank_w.astype(jnp.int32), axis=1), axis=1
            )  # leading blank-run length, 0 if frame 0 emits
            emit = active & (lead == 0)
            advance_n = jnp.where(active, lead, 0)

        # record emissions at position counts[b]
        slot = jnp.arange(u_max)[None, :] == counts[:, None]  # [B, U]
        put = slot & emit[:, None]
        tokens = jnp.where(put, tok[:, None], tokens)
        frames = jnp.where(put, time_idx[:, None], frames)
        counts = counts + emit.astype(jnp.int32)
        sym_at_frame = jnp.where(emit, sym_at_frame + 1, sym_at_frame)

        time_idx = time_idx + advance_n
        sym_at_frame = jnp.where(advance_n > 0, 0, sym_at_frame)

        # advance prediction network only where a token was emitted
        new_last = jnp.where(emit, tok, last_tok)
        step_out, step_state = predictor_step(pred_params, new_last, pred_state, rnnt_cfg)
        pred_out = jnp.where(emit[:, None], step_out, pred_out)
        if rnnt_cfg.predictor_kind == "stateless":
            pred_state = jnp.where(emit[:, None], step_state, pred_state)
        else:
            pred_state = (
                jnp.where(emit[None, :, None], step_state[0], pred_state[0]),
                jnp.where(emit[None, :, None], step_state[1], pred_state[1]),
            )
        last_tok = new_last

        return (tokens, frames, counts, time_idx, sym_at_frame, last_tok, pred_out, pred_state)

    init = (tokens, frames, counts, time_idx, sym_at_frame, last_tok, pred_out, pred_state)
    tokens, frames, counts, *_ = jax.lax.while_loop(cond, body, init)
    return tokens, frames, counts
