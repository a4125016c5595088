"""ALSD beam search for transducers (NeMo-faithful, TPU-native).

The reference's nemo flavor decodes with NeMo's Alignment-Length Synchronous
Decoding beam search (pkg/nemo-asr/src/transcribe.py:48-53 reaches
``model.transcribe`` whose decoding strategy is ALSD — pkg/nemo-asr/src/decode.py:33-40
documents and strips its leading-blank artifact). This module reproduces the
semantics of NeMo's ``BeamRNNTInfer.align_length_sync_decoding`` (our serial
reading of it is the oracle in tools/torch_reference.py:rnnt_alsd_reference;
the two are gated token-for-token by tools/convert_and_gate.py):

- every hypothesis advances one alignment step per loop iteration — blank
  (consume one encoder frame) or a label emission — so all live hypotheses
  share total steps t+u, exactly ALSD's length synchronisation;
- per step, each hypothesis proposes its blank extension plus its top
  ``beam_size`` label extensions; the best ``beam_size`` of all proposals
  survive (NeMo: ``B = sorted(A)[:beam]``);
- a blank extension that consumes the LAST encoder frame becomes a *final*
  hypothesis: it is recorded (kept as a snapshot copy) and leaves the beam
  on the next step, exactly like NeMo's ``t > T-1`` filter; the best final
  under length-normalised score (``score_norm``) is the result, falling back
  to the best live hypothesis when nothing finalised (NeMo returns ``B``);
- hypotheses with identical label sequences are recombined each step by
  log-sum-exp score merging into the earliest (best-ranked) occurrence.
  ``recombine_dedup`` selects between the two published behaviors: NeMo's
  ``recombine_hypotheses`` merges scores but returns the *un-deduplicated*
  list (the duplicate keeps its slot and own score), while the
  ESPnet/ALSD-paper formulation drops the duplicates. The default matches
  NeMo. (Known divergence risk, documented for tools/run_real_parity.py:
  NeMo appends the same hypothesis *object* to its final list and to the
  beam, so a later recombination can mutate an already-recorded final's
  score; we record finals as value snapshots.)
- the per-utterance alignment budget is ``T + int(alsd_max_target_len * T)``
  steps (NeMo's ``u_max``), with T the utterance's true encoder length.

One ``lax.while_loop`` drives the whole batch; beams are reordered with
gathers; all state is fixed-shape. Emissions carry (token, frame) pairs on
the same 0.08 s grid as the greedy decoder, so decode_hypothesis timestamp
math is unchanged (nemo/asr/decode.py reconstructs the ALSD timestamp
artifact convention from them).

Segmented API (continuous batching)
-----------------------------------

``alsd_state_init`` / ``alsd_segment`` / ``alsd_finalize`` expose the same
search as a resumable per-lane state machine — the ALSD twin of the
segmented Graves beam (transducer_graves.py): a fixed pool of lanes, each
with its own alignment-step clock, advances ``n_steps`` per call; finished
lanes are finalized and reset for new requests mid-flight. The per-step
body has no cross-lane ops, so per-lane results are bit-identical to a
dedicated ``rnnt_beam_decode`` (tests/test_alsd_segment.py). Unlike the
frame-clocked Graves beam, a lane's completion is data-dependent (the beam
can die before the step budget when every hypothesis consumes its last
frame), so ``alsd_segment`` also returns a ``done`` flag per lane — the
scheduler may harvest on it early, or fall back to the deterministic
host-side bound ``lane_len + floor(alsd_max_target_len * lane_len)``.
"""

from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..models.rnnt import (
    RNNTConfig,
    joint_precompute_enc,
    joint_step_from_enc_proj,
    predictor_step,
    predictor_zero_state,
)

__all__ = [
    "BeamDecodeConfig",
    "rnnt_beam_decode",
    "ALSDBeamState",
    "alsd_state_init",
    "alsd_segment",
    "alsd_finalize",
    "alsd_step_bound",
]

_DEAD = -1.0e30  # score of an empty/killed beam slot
_ALIVE = -1.0e25  # scores above this are live hypotheses (real scores are
#                   bounded below by max_steps * min_logp >> -1e25)


@dataclass(frozen=True)
class BeamDecodeConfig:
    beam_size: int = 4
    # NeMo alsd_max_target_len: emission budget as a fraction of T (float)
    # — u_max = int(alsd_max_target_len * T) per utterance.
    alsd_max_target_len: float = 1.0
    # select the result by score / len(y_sequence) (NeMo score_norm=True;
    # the length includes ALSD's leading blank, hence counts + 1)
    score_norm: bool = True
    # False = NeMo recombine_hypotheses (merge scores into the first
    # occurrence, keep the duplicate); True = drop merged duplicates
    # (the ESPnet/paper formulation)
    recombine_dedup: bool = False
    # emission buffer capacity; 0 -> T + u_max (the ALSD alignment bound, so
    # even never-advancing degenerate paths match the serial oracle exactly;
    # a FINAL hypothesis has at most u_max <= T emissions)
    max_tokens: int = 0
    # "pallas" fuses the per-step log-softmax + blank split + label top-m
    # into one VMEM pass (ops/beam_topk.py — the XLA chain is ~4 ms/step at
    # serving shape); "xla" is the reference formulation. Values and tie
    # order are identical. Set by the model loaders' TPU serving overrides.
    topk_impl: str = "xla"
    # "pallas" additionally pulls the joint's pred projection + activation +
    # output matmul INTO that kernel (ops/beam_topk.joint_topm) — one op for
    # the whole per-step tail; topk_impl is then moot. Same dtype chain as
    # the XLA joint (bf16 matmuls, fp32 log-softmax).
    joint_impl: str = "xla"
    # "pallas" runs each predictor LSTM cell as one fused kernel
    # (ops/lstm_step.py) instead of XLA's ~10-op chain; requires an "lstm"
    # predictor with pred_hidden % 128 == 0, otherwise ignored. The beam
    # while_loop is op-launch-bound, so fewer ops = wall-clock.
    lstm_impl: str = "xla"
    # alignment steps executed per while_loop iteration. EXACT: every body
    # update is frozen-element masked, so at most unroll-1 masked no-op
    # steps execute after all elements finish. Measured NEUTRAL at serving
    # shape on the dev TPU (the body overlaps the per-iteration dispatch
    # cost, which an empty loop measures at 43-80 us), and factors >2
    # trip the dev stack's compile fragility — serving keeps 1.
    unroll: int = 1


class ALSDBeamState(NamedTuple):
    """Cross-segment ALSD beam state (per lane).

    ``step`` is the lane's alignment-step clock (increments every body
    iteration while the pool runs, frozen lanes included — so the host can
    mirror it deterministically as ``step + n_steps`` per segment).
    ``pred_state`` holds whatever the predictor kind carries: an ``(h, c)``
    tuple of [B, K, L, H] for LSTM predictors, one [B, K, S] array for
    stateless ones.
    """

    step: jnp.ndarray  # [B] int32
    scores: jnp.ndarray  # [B, K] fp32 (_DEAD = empty slot)
    time_idx: jnp.ndarray  # [B, K] int32 encoder frame per hypothesis
    counts: jnp.ndarray  # [B, K] int32 emissions per hypothesis
    tokens: jnp.ndarray  # [B, K, U] int32
    frames: jnp.ndarray  # [B, K, U] int32
    last_tok: jnp.ndarray  # [B, K] int32
    pred_out: jnp.ndarray  # [B, K, H] fp32 predictor output
    pred_state: Any
    # recorded best final per lane (value snapshots; see module notes)
    fin_key: jnp.ndarray  # [B] fp32 in the selection metric
    fin_raw: jnp.ndarray  # [B] fp32 raw score
    fin_tokens: jnp.ndarray  # [B, U] int32
    fin_frames: jnp.ndarray  # [B, U] int32
    fin_count: jnp.ndarray  # [B] int32
    fin_any: jnp.ndarray  # [B] bool


def _tree_take_beams(state, idx):
    """Gather along the beam axis (axis=1 of [B, K, ...] arrays)."""
    def take(x):
        return jnp.take_along_axis(
            x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
        )
    return jax.tree.map(take, state)


def _norm_key(cfg, score, counts):
    if not cfg.score_norm:
        return score
    return score / (counts.astype(jnp.float32) + 1.0)


def _make_pred_step(pred_params, rnnt_cfg: RNNTConfig, cfg: BeamDecodeConfig):
    """predictor_step over flat [R] token rows, optionally via the fused
    cell kernel (state stays (h, c) [L, R, H] either way)."""
    use_lstm_kernel = (
        cfg.lstm_impl == "pallas"
        and rnnt_cfg.predictor_kind == "lstm"
        and rnnt_cfg.pred_hidden % 128 == 0
    )

    def pred_step(tokens_flat, state_flat):
        if not use_lstm_kernel:
            return predictor_step(pred_params, tokens_flat, state_flat, rnnt_cfg)
        from ..models.rnnt import _embed_tokens
        from ..ops.lstm_step import lstm_cell_step

        # in-kernel compute is fp32: the per-step matmuls are launch-bound,
        # not FLOP-bound, so fp32 costs nothing and tracks the fp32 oracle
        # more closely than the XLA bf16 chain (same policy as ln_dense)
        x = _embed_tokens(pred_params, tokens_flat, rnnt_cfg)
        x = x.astype(jnp.float32)
        hst, cst = state_flat
        hs, cs = [], []
        for li, layer in enumerate(pred_params["lstm"]):
            hn, cn = lstm_cell_step(
                layer["w_ih"], layer["w_hh"], layer["b_ih"] + layer["b_hh"],
                x, hst[li], cst[li],
                compute_dtype="float32",
            )
            hs.append(hn)
            cs.append(cn)
            x = hn
        return x, (jnp.stack(hs), jnp.stack(cs))

    return pred_step


def _make_joint_topm(joint_params, rnnt_cfg: RNNTConfig, cfg: BeamDecodeConfig,
                     m: int, blank: int):
    """Per-step joint tail -> (lp_blank, top_lp, top_tok), each [R, ...]."""

    def joint_topm_step(enc_rows, dec_rows):
        if cfg.joint_impl == "pallas":
            from ..ops.beam_topk import joint_topm

            return joint_topm(
                joint_params["pred"]["w"], joint_params["pred"]["b"],
                joint_params["out"]["w"], joint_params["out"]["b"],
                enc_rows, dec_rows, m, blank,
                activation=rnnt_cfg.joint_activation,
                compute_dtype="float32",  # launch-bound; fp32 is free here
            )
        logits = joint_step_from_enc_proj(
            joint_params, enc_rows, dec_rows, rnnt_cfg
        )  # [R, V]
        if cfg.topk_impl == "pallas":
            from ..ops.beam_topk import topm_logsoftmax

            return topm_logsoftmax(logits, m, blank)
        from ..ops.beam_topk import topm_logsoftmax_xla

        return topm_logsoftmax_xla(logits, m, blank)

    return joint_topm_step


def _init_state(pred_params, b, rnnt_cfg: RNNTConfig, cfg: BeamDecodeConfig,
                u_buf: int) -> ALSDBeamState:
    """Fresh beam state: slot 0 is the initial hypothesis (blank consumed by
    one predictor step), the rest are dead."""
    k = cfg.beam_size
    bk = b * k
    blank = rnnt_cfg.blank_id
    h = rnnt_cfg.pred_hidden
    pred_step = _make_pred_step(pred_params, rnnt_cfg, cfg)

    pred_state0 = predictor_zero_state(bk, rnnt_cfg)
    pred_out0, pred_state0 = pred_step(
        jnp.full((bk,), blank, jnp.int32), pred_state0
    )
    pred_out = pred_out0.reshape(b, k, h)
    if rnnt_cfg.predictor_kind == "stateless":
        pred_state = pred_state0.reshape(b, k, -1)
    else:
        # (h, c) [L, B*K, H] -> [B, K, L, H] for beam gathers
        pred_state = tuple(
            jnp.transpose(s, (1, 0, 2)).reshape(b, k, -1, h) for s in pred_state0
        )

    return ALSDBeamState(
        step=jnp.zeros((b,), jnp.int32),
        scores=jnp.tile(
            jnp.array([0.0] + [_DEAD] * (k - 1), jnp.float32), (b, 1)),
        time_idx=jnp.zeros((b, k), jnp.int32),
        counts=jnp.zeros((b, k), jnp.int32),
        tokens=jnp.full((b, k, u_buf), blank, jnp.int32),
        frames=jnp.zeros((b, k, u_buf), jnp.int32),
        last_tok=jnp.full((b, k), blank, jnp.int32),
        pred_out=pred_out,
        pred_state=pred_state,
        fin_key=jnp.full((b,), _DEAD, jnp.float32),
        fin_raw=jnp.full((b,), _DEAD, jnp.float32),
        fin_tokens=jnp.full((b, u_buf), blank, jnp.int32),
        fin_frames=jnp.zeros((b, u_buf), jnp.int32),
        fin_count=jnp.zeros((b,), jnp.int32),
        fin_any=jnp.zeros((b,), bool),
    )


def _apply_reset(state: ALSDBeamState, reset,
                 fresh: ALSDBeamState) -> ALSDBeamState:
    """Re-initialise lanes flagged in ``reset`` (new request joins)."""
    b = state.scores.shape[0]

    def pick(new, old):
        return jnp.where(reset.reshape((b,) + (1,) * (new.ndim - 1)), new, old)

    return jax.tree.map(pick, fresh, state)


def _el_active(state: ALSDBeamState, enc_lengths, u_max_el):
    """Lanes still inside their ALSD budget with a live hypothesis."""
    return (state.step < enc_lengths + u_max_el) & jnp.any(
        state.scores > _ALIVE, axis=1)


def _make_body(pred_params, joint_params, enc_proj, enc_lengths, u_max_el,
               rnnt_cfg: RNNTConfig, cfg: BeamDecodeConfig):
    """One ALSD alignment step over the whole lane pool.

    The body has NO cross-lane ops (top-k, recombination, and finals are all
    per-element), so each lane's trajectory is identical to a dedicated
    decode of its own utterance — the property the segmented API rests on.
    Frozen lanes (outside their budget or beam-dead) keep their state;
    ``step`` increments unconditionally so the host can mirror it.
    """
    b, t, _ = enc_proj.shape
    k = cfg.beam_size
    m = min(k, rnnt_cfg.num_classes - 1)  # label expansions per hypothesis
    blank = rnnt_cfg.blank_id
    h = rnnt_cfg.pred_hidden
    bk = b * k
    pred_step = _make_pred_step(pred_params, rnnt_cfg, cfg)
    joint_topm_step = _make_joint_topm(joint_params, rnnt_cfg, cfg, m, blank)

    def flat(x):  # [B, K, ...] -> [B*K, ...]
        return x.reshape((bk,) + x.shape[2:])

    def body(state: ALSDBeamState) -> ALSDBeamState:
        (step, scores, time_idx, counts, tokens, frames, last_tok,
         pred_out, pred_state,
         fin_key, fin_raw, fin_tokens, fin_frames, fin_count, fin_any) = state
        u_buf = tokens.shape[-1]

        active_el = _el_active(state, enc_lengths, u_max_el)  # [B]
        alive = scores > _ALIVE  # [B, K]

        safe_t = jnp.minimum(time_idx, t - 1)  # [B, K]
        enc_frames = jnp.take_along_axis(
            enc_proj[:, None], safe_t[..., None, None], axis=2
        )[:, :, 0]  # [B, K, J]
        lp_blank, top_lp, top_tok = joint_topm_step(
            flat(enc_frames), flat(pred_out)
        )
        lp_blank = lp_blank.reshape(b, k)
        top_lp = top_lp.reshape(b, k, m)
        top_tok = top_tok.reshape(b, k, m)

        blank_scores = jnp.where(alive, scores + lp_blank, _DEAD)  # [B, K]
        can_emit = alive & (counts < u_buf)
        emit_scores = jnp.where(
            can_emit[..., None], scores[..., None] + top_lp, _DEAD
        )  # [B, K, M]

        # --- finals: blank extension of a hypothesis at its last frame ----
        finalize = alive & (time_idx == enc_lengths[:, None] - 1)  # [B, K]
        f_key = jnp.where(finalize, _norm_key(cfg, blank_scores, counts), _DEAD)
        best_k = jnp.argmax(f_key, axis=1)  # [B]
        best_key = jnp.take_along_axis(f_key, best_k[:, None], axis=1)[:, 0]
        improved = active_el & (best_key > fin_key)
        g1 = lambda x: jnp.take_along_axis(x, best_k[:, None], axis=1)[:, 0]
        g2 = lambda x: jnp.take_along_axis(x, best_k[:, None, None], axis=1)[:, 0]
        fin_key = jnp.where(improved, best_key, fin_key)
        fin_raw = jnp.where(improved, g1(blank_scores), fin_raw)
        fin_tokens = jnp.where(improved[:, None], g2(tokens), fin_tokens)
        fin_frames = jnp.where(improved[:, None], g2(frames), fin_frames)
        fin_count = jnp.where(improved, g1(counts), fin_count)
        fin_any = fin_any | (improved & jnp.any(finalize, axis=1))

        # --- beam selection: top-K of all blank + label proposals ---------
        all_scores = jnp.concatenate(
            [blank_scores[..., None], emit_scores], axis=-1
        )  # [B, K, M+1]
        flat_scores = all_scores.reshape(b, k * (m + 1))
        new_scores, flat_idx = jax.lax.top_k(flat_scores, k)  # [B, K]
        src_beam = flat_idx // (m + 1)
        cand = flat_idx % (m + 1)  # 0 = blank, >=1 = label index

        gathered = _tree_take_beams(
            {
                "time_idx": time_idx,
                "counts": counts,
                "tokens": tokens,
                "frames": frames,
                "last_tok": last_tok,
                "pred_out": pred_out,
                "top_tok": top_tok,
                "pred_state": pred_state,
            },
            src_beam,
        )
        n_time = gathered["time_idx"]
        n_counts = gathered["counts"]
        n_tokens = gathered["tokens"]
        n_frames = gathered["frames"]
        n_last = gathered["last_tok"]
        n_pred_out = gathered["pred_out"]
        n_pred_state = gathered["pred_state"]

        sel_alive = new_scores > _ALIVE
        is_blank = cand == 0
        new_tok = jnp.take_along_axis(
            gathered["top_tok"], jnp.maximum(cand - 1, 0)[..., None], axis=-1
        )[..., 0].astype(jnp.int32)

        emit = ~is_blank & sel_alive
        advance = is_blank & sel_alive

        slot = jnp.arange(u_buf)[None, None, :] == n_counts[..., None]
        put = slot & emit[..., None]
        n_tokens = jnp.where(put, new_tok[..., None], n_tokens)
        n_frames = jnp.where(put, n_time[..., None], n_frames)
        n_counts = n_counts + emit.astype(jnp.int32)
        n_time = n_time + advance.astype(jnp.int32)

        # a hypothesis that consumed its last frame finalised above — it
        # leaves the beam (NeMo's t > T-1 filter on the next step)
        new_scores = jnp.where(
            n_time >= enc_lengths[:, None], _DEAD, new_scores
        )

        # --- recombination (identical label sequences merge) --------------
        valid = new_scores > _ALIVE
        tok_eq = jnp.all(
            n_tokens[:, :, None, :] == n_tokens[:, None, :, :], axis=-1
        )  # [B, K, K]
        eq = (
            tok_eq
            & (n_counts[:, :, None] == n_counts[:, None, :])
            & valid[:, :, None]
            & valid[:, None, :]
        )
        jidx = jnp.arange(k)
        leader = jnp.min(
            jnp.where(eq, jidx[None, None, :], k), axis=-1
        )  # [B, K] — earliest equal slot (top_k output is sorted by score)
        leader = jnp.where(valid, leader, jidx[None, :])
        is_leader = leader == jidx[None, :]
        member = leader[:, :, None] == jidx[None, None, :]  # [B, K(i), K(j)]
        member_scores = jnp.where(member, new_scores[:, :, None], _DEAD)
        mmax = jnp.max(member_scores, axis=1)  # [B, K(j)]
        merged = mmax + jnp.log(
            jnp.sum(jnp.exp(member_scores - mmax[:, None, :]), axis=1)
        )
        if cfg.recombine_dedup:
            new_scores = jnp.where(is_leader, merged, _DEAD)
        else:  # NeMo: merge into the first occurrence, keep the duplicate
            new_scores = jnp.where(is_leader, merged, new_scores)

        # --- prediction network advances where a label was emitted --------
        stepped_tok = jnp.where(emit, new_tok, n_last)
        if rnnt_cfg.predictor_kind == "stateless":
            ps_flat = flat(n_pred_state)
        else:
            ps_flat = tuple(
                jnp.transpose(flat(s), (1, 0, 2)) for s in n_pred_state
            )
        new_out, new_state = pred_step(flat(stepped_tok), ps_flat)
        new_out = new_out.reshape(b, k, h)
        n_pred_out = jnp.where(emit[..., None], new_out, n_pred_out)
        if rnnt_cfg.predictor_kind == "stateless":
            new_state = new_state.reshape(b, k, -1)
            n_pred_state = jnp.where(emit[..., None], new_state, n_pred_state)
        else:
            new_state = tuple(
                jnp.transpose(s, (1, 0, 2)).reshape(b, k, -1, h) for s in new_state
            )
            n_pred_state = tuple(
                jnp.where(emit[..., None, None], n, o)
                for n, o in zip(new_state, n_pred_state)
            )
        n_last = stepped_tok

        # --- freeze elements outside their budget -------------------------
        keep = lambda new, old: jnp.where(
            active_el.reshape((b,) + (1,) * (new.ndim - 1)), new, old
        )
        scores = keep(new_scores, scores)
        time_idx = keep(n_time, time_idx)
        counts = keep(n_counts, counts)
        tokens = keep(n_tokens, tokens)
        frames = keep(n_frames, frames)
        last_tok = keep(n_last, last_tok)
        pred_out = keep(n_pred_out, pred_out)
        if rnnt_cfg.predictor_kind == "stateless":
            pred_state = keep(n_pred_state, pred_state)
        else:
            pred_state = tuple(
                keep(n, o) for n, o in zip(n_pred_state, pred_state)
            )

        return ALSDBeamState(
            step + 1, scores, time_idx, counts, tokens, frames, last_tok,
            pred_out, pred_state,
            fin_key, fin_raw, fin_tokens, fin_frames, fin_count, fin_any)

    return body


def _select_best(state: ALSDBeamState, cfg: BeamDecodeConfig):
    """Best recorded final, falling back to the best live hypothesis when
    nothing finalised (NeMo returns ``B``)."""
    beam_key = jnp.where(
        state.scores > _ALIVE,
        _norm_key(cfg, state.scores, state.counts), _DEAD)
    best = jnp.argmax(beam_key, axis=1)  # [B]
    take1 = lambda x: jnp.take_along_axis(x, best[:, None], axis=1)[:, 0]
    take2 = lambda x: jnp.take_along_axis(x, best[:, None, None], axis=1)[:, 0]

    fin_any = state.fin_any
    out_tokens = jnp.where(fin_any[:, None], state.fin_tokens,
                           take2(state.tokens))
    out_frames = jnp.where(fin_any[:, None], state.fin_frames,
                           take2(state.frames))
    out_counts = jnp.where(fin_any, state.fin_count, take1(state.counts))
    out_scores = jnp.where(fin_any, state.fin_raw, take1(state.scores))
    return out_tokens, out_frames, out_counts, out_scores


@partial(jax.jit, static_argnames=("rnnt_cfg", "cfg"))
def rnnt_beam_decode(
    pred_params,
    joint_params,
    enc,
    enc_lengths,
    rnnt_cfg: RNNTConfig,
    cfg: BeamDecodeConfig = BeamDecodeConfig(),
):
    """ALSD beam-search decode a batch.

    Args:
      enc: [B, T, E] fp32; enc_lengths: [B]

    Returns:
      (tokens [B, U] int32 of the best hypothesis, frames [B, U] int32,
       counts [B] int32, scores [B] fp32 — raw, unnormalised)
    """
    b, t, e = enc.shape
    enc_proj = joint_precompute_enc(joint_params, enc, rnnt_cfg)  # [B, T, J]
    u_buf = cfg.max_tokens or (t + int(cfg.alsd_max_target_len * t))

    # per-utterance alignment budget (NeMo: int(ratio * T) emissions)
    u_max_el = jnp.floor(cfg.alsd_max_target_len * enc_lengths).astype(jnp.int32)
    max_steps = t + int(cfg.alsd_max_target_len * t)

    body = _make_body(pred_params, joint_params, enc_proj, enc_lengths,
                      u_max_el, rnnt_cfg, cfg)
    init = _init_state(pred_params, b, rnnt_cfg, cfg, u_buf)

    def cond(state):
        return (state.step[0] < max_steps) & jnp.any(
            _el_active(state, enc_lengths, u_max_el))

    def body_n(state):
        for _ in range(max(1, cfg.unroll)):
            state = body(state)
        return state

    state = jax.lax.while_loop(cond, body_n, init)
    return _select_best(state, cfg)


# --------------------------------------------------------------------------
# segmented API (continuous batching; see module notes)
# --------------------------------------------------------------------------


def alsd_step_bound(lane_len: int, cfg: BeamDecodeConfig) -> int:
    """Deterministic upper bound on a lane's alignment steps — the host-side
    completion fallback (``done`` from :func:`alsd_segment` is usually much
    earlier: the beam dies once every hypothesis consumes its last frame)."""
    return int(lane_len) + int(cfg.alsd_max_target_len * int(lane_len))


@partial(jax.jit, static_argnames=("b", "rnnt_cfg", "cfg"))
def alsd_state_init(pred_params, b: int, rnnt_cfg: RNNTConfig,
                    cfg: BeamDecodeConfig) -> ALSDBeamState:
    """Fresh lane-pool state for the segmented API (cfg.max_tokens required —
    segments can't default the emission buffer to T)."""
    if cfg.max_tokens <= 0:
        raise ValueError(
            "alsd_state_init: cfg.max_tokens must be set for segmented "
            "decode (the emission buffer cannot default to T)")
    return _init_state(pred_params, b, rnnt_cfg, cfg, cfg.max_tokens)


@partial(jax.jit, static_argnames=("rnnt_cfg", "cfg", "n_steps"))
def alsd_segment(
    pred_params,
    joint_params,
    enc_ring,
    lane_len,
    reset_mask,
    state: ALSDBeamState,
    rnnt_cfg: RNNTConfig,
    cfg: BeamDecodeConfig,
    n_steps: int,
):
    """Advance every lane by up to ``n_steps`` alignment steps.

    Args:
      enc_ring: [B, T_buf, J] per-lane joint enc projections
        (``joint_precompute_enc`` of each lane's utterance, written at rows
        0..len-1 of its lane)
      lane_len: [B] int32 — valid encoder frames per lane (0 = idle lane)
      reset_mask: [B] bool — lanes re-initialised before stepping (a new
        request was swapped in)
      state: lane-pool state from ``alsd_state_init`` / a prior segment

    Returns ``(state, done)`` with ``done`` [B] bool — True once a lane's
    search is over (budget exhausted or beam dead with its best final
    recorded). ``state.step`` advances by exactly ``n_steps`` for every lane
    unless the whole pool goes inactive early, so the host clock
    ``min(step + n_steps, alsd_step_bound(lane_len))`` plus the returned
    ``done`` flags schedule harvesting without any other readback. Per-lane
    results are bit-identical to a dedicated ``rnnt_beam_decode``.
    """
    b = state.scores.shape[0]
    fresh = _init_state(pred_params, b, rnnt_cfg, cfg, state.tokens.shape[-1])
    state = _apply_reset(state, reset_mask, fresh)

    u_max_el = jnp.floor(
        cfg.alsd_max_target_len * lane_len).astype(jnp.int32)
    body = _make_body(pred_params, joint_params, enc_ring, lane_len,
                      u_max_el, rnnt_cfg, cfg)

    def cond(carry):
        i, state = carry
        return (i < n_steps) & jnp.any(_el_active(state, lane_len, u_max_el))

    def body_i(carry):
        i, state = carry
        return i + 1, body(state)

    _, state = jax.lax.while_loop(cond, body_i, (jnp.int32(0), state))
    done = ~_el_active(state, lane_len, u_max_el)
    return state, done


@partial(jax.jit, static_argnames=("rnnt_cfg", "cfg"))
def alsd_finalize(state: ALSDBeamState, lane_len,
                  rnnt_cfg: RNNTConfig, cfg: BeamDecodeConfig):
    """Best-hypothesis extraction for (any subset of) lanes: returns
    (tokens [B, U], frames [B, U], counts [B], scores [B])."""
    out_tokens, out_frames, out_counts, out_scores = _select_best(state, cfg)
    # empty-input rows: nothing decoded
    out_counts = jnp.where(lane_len <= 0, 0, out_counts)
    return out_tokens, out_frames, out_counts, out_scores
