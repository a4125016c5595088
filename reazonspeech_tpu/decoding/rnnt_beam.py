"""Beam search for transducers (ALSD-style, TPU-native).

Replaces NeMo's ALSD beam search (the decode strategy behind the reference's
transcribe, SURVEY.md §3.1) with an alignment-length-synchronous beam kept in
fixed-shape arrays: every hypothesis advances one alignment step per loop
iteration — either a blank (consume one encoder frame) or a label emission —
so hypotheses stay synchronized by total steps t+u, as in ALSD. One
``lax.while_loop`` drives the whole batch; beams are reordered with gathers.

Emissions carry (token, frame) pairs on the same 0.08 s grid as the greedy
decoder, so decode_hypothesis timestamp math is unchanged.
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

__all__ = ["BeamDecodeConfig", "rnnt_beam_decode"]

_NEG = -1e30


@dataclass(frozen=True)
class BeamDecodeConfig:
    beam_size: int = 4
    # label candidates considered per hypothesis per step (besides blank)
    expand_labels: int = 4
    max_tokens: int = 0  # 0 -> T
    # ALSD length cap: alignment steps = T + max_tokens


def _tree_take_beams(state, idx):
    """Gather along the beam axis (axis=1 of [B, K, ...] arrays)."""
    def take(x):
        return jnp.take_along_axis(
            x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
        )
    return jax.tree.map(take, state)


@partial(jax.jit, static_argnames=("rnnt_cfg", "cfg"))
def rnnt_beam_decode(
    pred_params,
    joint_params,
    enc,
    enc_lengths,
    rnnt_cfg: RNNTConfig,
    cfg: BeamDecodeConfig = BeamDecodeConfig(),
):
    """Beam-search decode a batch.

    Args:
      enc: [B, T, E] fp32; enc_lengths: [B]

    Returns:
      (tokens [B, U] int32 of the best hypothesis, frames [B, U] int32,
       counts [B] int32, scores [B] fp32)
    """
    b, t, e = enc.shape
    enc_proj = joint_precompute_enc(joint_params, enc, rnnt_cfg)  # [B, T, J]
    k = cfg.beam_size
    m = min(cfg.expand_labels, rnnt_cfg.num_classes - 1)
    blank = rnnt_cfg.blank_id
    u_max = cfg.max_tokens or t
    bk = b * k

    def flat(x):  # [B, K, ...] -> [B*K, ...]
        return x.reshape((bk,) + x.shape[2:])

    # beam state
    scores = jnp.tile(jnp.array([0.0] + [_NEG] * (k - 1)), (b, 1))  # [B, K]
    time_idx = jnp.zeros((b, k), jnp.int32)
    counts = jnp.zeros((b, k), jnp.int32)
    tokens = jnp.full((b, k, u_max), blank, jnp.int32)
    frames = jnp.zeros((b, k, u_max), jnp.int32)
    last_tok = jnp.full((b, k), blank, jnp.int32)
    done = jnp.zeros((b, k), bool)

    pred_state0 = predictor_zero_state(bk, rnnt_cfg)
    pred_out0, pred_state0 = predictor_step(
        pred_params, jnp.full((bk,), blank, jnp.int32), pred_state0, rnnt_cfg
    )
    h = rnnt_cfg.pred_hidden
    pred_out = pred_out0.reshape(b, k, h)
    if rnnt_cfg.predictor_kind == "stateless":
        pred_state = pred_state0.reshape(b, k, -1)
    else:
        # (h, c) [L, B*K, H] -> [B, K, L, H] for beam gathers
        pred_state = tuple(
            jnp.transpose(s, (1, 0, 2)).reshape(b, k, -1, h) for s in pred_state0
        )

    max_steps = t + u_max

    def cond(state):
        step, scores, time_idx, done = state[0], state[1], state[2], state[8]
        return (step < max_steps) & ~jnp.all(done)

    def body(state):
        (step, scores, time_idx, counts, tokens, frames, last_tok,
         pred_out, done, pred_state) = state

        safe_t = jnp.minimum(time_idx, t - 1)  # [B, K]
        enc_frames = jnp.take_along_axis(
            enc_proj[:, None], safe_t[..., None, None], axis=2
        )[:, :, 0]  # [B, K, J]
        logits = joint_step_from_enc_proj(
            joint_params, flat(enc_frames), flat(pred_out), rnnt_cfg
        ).reshape(b, k, -1)
        logp = jax.nn.log_softmax(logits, axis=-1)

        active = ~done
        lp_blank = jnp.where(active, logp[..., blank], 0.0)
        # mask blank from label candidates
        label_logp = logp.at[..., blank].set(_NEG)
        top_lp, top_tok = jax.lax.top_k(label_logp, m)  # [B, K, M]

        # candidate 0: blank/advance; candidates 1..M: emissions
        can_emit = active & (counts < u_max) & (time_idx < enc_lengths[:, None])
        emit_scores = jnp.where(
            can_emit[..., None], scores[..., None] + top_lp, _NEG
        )  # [B, K, M]
        blank_scores = scores + lp_blank  # [B, K] (done hyps keep score)

        all_scores = jnp.concatenate(
            [blank_scores[..., None], emit_scores], axis=-1
        )  # [B, K, M+1]
        flat_scores = all_scores.reshape(b, k * (m + 1))
        new_scores, flat_idx = jax.lax.top_k(flat_scores, k)  # [B, K]
        src_beam = flat_idx // (m + 1)
        cand = flat_idx % (m + 1)  # 0 = blank, >=1 = label index

        # gather beam state from source beams
        gathered = _tree_take_beams(
            {
                "time_idx": time_idx,
                "counts": counts,
                "tokens": tokens,
                "frames": frames,
                "last_tok": last_tok,
                "pred_out": pred_out,
                "done": done,
                "top_tok": top_tok,
                "pred_state": pred_state,
            },
            src_beam,
        )
        time_idx = gathered["time_idx"]
        counts = gathered["counts"]
        tokens = gathered["tokens"]
        frames = gathered["frames"]
        last_tok = gathered["last_tok"]
        pred_out = gathered["pred_out"]
        done = gathered["done"]
        pred_state = gathered["pred_state"]

        is_blank = cand == 0
        new_tok = jnp.take_along_axis(
            gathered["top_tok"], jnp.maximum(cand - 1, 0)[..., None], axis=-1
        )[..., 0].astype(jnp.int32)

        emit = ~is_blank & ~done
        advance = is_blank & ~done

        slot = jnp.arange(u_max)[None, None, :] == counts[..., None]
        put = slot & emit[..., None]
        tokens = jnp.where(put, new_tok[..., None], tokens)
        frames = jnp.where(put, time_idx[..., None], frames)
        counts = counts + emit.astype(jnp.int32)

        time_idx = time_idx + advance.astype(jnp.int32)
        # NOTE: a full emission buffer only blocks further emissions
        # (can_emit above); the hypothesis stays live and must still pay the
        # blank cost of every remaining frame — marking it done here would
        # inflate emission-heavy paths' scores.
        done = done | (time_idx >= enc_lengths[:, None])

        # advance prediction network where a label was emitted
        stepped_tok = jnp.where(emit, new_tok, last_tok)
        if rnnt_cfg.predictor_kind == "stateless":
            ps_flat = flat(pred_state)
        else:
            ps_flat = tuple(
                jnp.transpose(flat(s), (1, 0, 2)) for s in pred_state
            )
        new_out, new_state = predictor_step(
            pred_params, flat(stepped_tok), ps_flat, rnnt_cfg
        )
        new_out = new_out.reshape(b, k, h)
        pred_out = jnp.where(emit[..., None], new_out, pred_out)
        if rnnt_cfg.predictor_kind == "stateless":
            new_state = new_state.reshape(b, k, -1)
            pred_state = jnp.where(emit[..., None], new_state, pred_state)
        else:
            new_state = tuple(
                jnp.transpose(s, (1, 0, 2)).reshape(b, k, -1, h) for s in new_state
            )
            pred_state = tuple(
                jnp.where(emit[..., None, None], n, o)
                for n, o in zip(new_state, pred_state)
            )
        last_tok = stepped_tok

        return (step + 1, new_scores, time_idx, counts, tokens, frames,
                last_tok, pred_out, done, pred_state)

    init = (jnp.int32(0), scores, time_idx, counts, tokens, frames, last_tok,
            pred_out, done, pred_state)
    (_, scores, _, counts, tokens, frames, _, _, _, _) = jax.lax.while_loop(
        cond, body, init
    )

    best = jnp.argmax(scores, axis=1)  # [B]
    take = lambda x: jnp.take_along_axis(
        x, best.reshape((b, 1) + (1,) * (x.ndim - 2)), axis=1
    )[:, 0]
    return take(tokens), take(frames), take(counts), jnp.take_along_axis(
        scores, best[:, None], axis=1
    )[:, 0]
