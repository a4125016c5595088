"""Alignment-synchronous transducer beam search (mAES), TPU-native.

The reference's espnet flavor serves ESPnet's ``default_beam_search``
(Graves 2012 best-first; pkg/espnet-asr/src/transcribe.py:27-32,69 — our
token-gated port is decoding/transducer_graves.py). That algorithm is
intrinsically serial: tens of dependent predictor+joint pops per encoder
frame, which on a TPU is loop-iteration-floor-bound (CLAUDE.md round-3
ledger: every op-count lever measured neutral). This module is the
algorithm-level alternative ESPnet itself offers as ``search_type="maes"``:
the *modified Adaptive Expansion Search* of Kim & Sung, "Accelerating RNN
Transducer Inference via Adaptive Expansion Search" (IEEE SPL 2020),
re-derived for fixed-shape batched execution rather than ported.

Per encoder frame, instead of a serial pop loop:

1. *prefix merge* (``prefix_alpha``): hypotheses whose label sequence is a
   proper prefix of another (length gap 1) donate their probability mass of
   emitting the missing label this frame — one batched gather + logaddexp
   over the [B, K, K] pair grid.
2. at most ``nstep`` *expansion steps*, each ONE [B*K]-row batched joint →
   top-(beam+beta) labels + blank → per-hypothesis pruning to candidates
   within ``expansion_gamma`` of that hypothesis' best candidate → global
   top-K of the surviving label expansions → ONE batched predictor step.
   Blank-extended hypotheses accumulate in a kept list; after the final
   step the surviving expansions are blank-terminated (their new dec_out's
   blank log-prob) and merged with the kept list, top-K survives.

So the whole frame is O(nstep) batched MXU ops — O(frames) total work with
no data-dependent inner loop, vs Graves' ~55 serial pops/frame measured at
serving shapes.

Fixed-shape reading (the serial oracle
``tools/torch_reference.py::espnet_maes_beam_reference`` implements the SAME
bounded variant, so the parity gate is token-exact):

- the working expansion set is pruned to the top ``beam_size`` after every
  inner step (ESPnet carries the unpruned list; the gamma filter keeps the
  practical difference near nil — to be CER-gated on real weights);
- candidates per hypothesis are blank (always offered) plus the top
  ``beam_size + expansion_beta`` labels (ESPnet takes the top
  ``beam + beta`` of the full vocab, so blank competes for a slot);
- ``max_tokens`` caps emissions per utterance (shapes must be static);
- ``prefix_alpha`` ∈ {0, 1}: 1 (the ESPnet/Speech2Text default) needs only
  each hypothesis' current dec_out; deeper merges would need per-token
  dec_out history.

Output selection matches ESPnet ``sort_nbest``: best hypothesis by
``score / (len + 1)`` when ``score_norm`` (the leading blank counts).

The cross-frame state is the survivor tuple (:class:`MAESBeamState`), so the
search is resumable in bounded segments exactly like the Graves decoder
(``maes_state_init`` → ``maes_beam_segment``\\* → ``maes_finalize``) and
plugs into the continuous-batching executor unchanged.
"""

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

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
    "MAESBeamConfig",
    "MAESBeamState",
    "maes_beam_decode",
    "maes_state_init",
    "maes_beam_segment",
    "maes_finalize",
]

_DEAD = -1.0e30
_ALIVE = -1.0e25


@dataclass(frozen=True)
class MAESBeamConfig:
    beam_size: int = 20
    # expansion steps per frame (ESPnet maes_num_steps; >= 1)
    nstep: int = 2
    # label candidates per hypothesis = beam_size + expansion_beta
    expansion_beta: int = 2
    # keep candidates within this log-prob gap of the hypothesis' best
    expansion_gamma: float = 2.3
    # 1 = merge length-gap-1 prefixes (ESPnet default); 0 = off
    prefix_alpha: int = 1
    # select by score / (len + 1) (ESPnet score_norm default True)
    score_norm: bool = True
    # emission buffer (0 -> T; must be set for the segmented API)
    max_tokens: int = 0
    # "pallas": fused log-softmax + blank split + top-m (ops/beam_topk.py)
    topk_impl: str = "xla"


class MAESBeamState(NamedTuple):
    """Cross-segment survivor state (per lane).

    ``fidx`` is the lane's next encoder frame; slot arrays hold the beam
    (score ``_DEAD`` = empty slot). ``dec`` is each hypothesis' current
    prediction-network output (after feeding its last label, or the
    blank-primed start), ``ph``/``pc`` the matching post-step LSTM state.
    """

    fidx: jnp.ndarray  # [B] int32
    cs: jnp.ndarray  # [B, K] fp32 scores
    st: jnp.ndarray  # [B, K, U] int32 tokens
    sf: jnp.ndarray  # [B, K, U] int32 emission frames
    sc: jnp.ndarray  # [B, K] int32 token counts
    dec: jnp.ndarray  # [B, K, H] fp32 dec_out
    ph: jnp.ndarray  # [B, K, L, H] fp32 post-step LSTM h
    pc: jnp.ndarray  # [B, K, L, H] fp32 post-step LSTM c


def _validate(rnnt_cfg: RNNTConfig, cfg: MAESBeamConfig):
    if rnnt_cfg.predictor_kind != "lstm":
        raise NotImplementedError("maes beam search: LSTM predictors only")
    if not rnnt_cfg.blank_first:
        raise NotImplementedError("espnet convention: blank id 0")
    if cfg.nstep < 1:
        raise ValueError("maes: nstep must be >= 1")
    if cfg.prefix_alpha not in (0, 1):
        raise NotImplementedError(
            "maes: prefix_alpha > 1 needs per-token dec_out history")


def _sos_step(pred_params, b, rnnt_cfg: RNNTConfig):
    """Blank-primed predictor start: dec_out + post-state of feeding blank
    into the zero state (ESPnet's init hypothesis)."""
    toks = jnp.full((b,), rnnt_cfg.blank_id, jnp.int32)
    g, (h, c) = predictor_step(
        pred_params, toks, predictor_zero_state(b, rnnt_cfg), rnnt_cfg)
    # [L, B, H] -> [B, L, H]
    return g, jnp.transpose(h, (1, 0, 2)), jnp.transpose(c, (1, 0, 2))


def _fresh_state(pred_params, b, rnnt_cfg: RNNTConfig, cfg: MAESBeamConfig,
                 u_buf):
    k = min(cfg.beam_size, rnnt_cfg.num_classes)
    lyr, h = rnnt_cfg.pred_rnn_layers, rnnt_cfg.pred_hidden
    g0, h0, c0 = _sos_step(pred_params, b, rnnt_cfg)
    cs = jnp.full((b, k), _DEAD, jnp.float32).at[:, 0].set(0.0)
    return MAESBeamState(
        fidx=jnp.zeros((b,), jnp.int32),
        cs=cs,
        st=jnp.zeros((b, k, u_buf), jnp.int32),
        sf=jnp.zeros((b, k, u_buf), jnp.int32),
        sc=jnp.zeros((b, k), jnp.int32),
        dec=jnp.zeros((b, k, g0.shape[-1]), jnp.float32).at[:, 0].set(g0),
        ph=jnp.zeros((b, k, lyr, h), jnp.float32).at[:, 0].set(h0),
        pc=jnp.zeros((b, k, lyr, h), jnp.float32).at[:, 0].set(c0),
    )


def maes_state_init(pred_params, b, rnnt_cfg: RNNTConfig,
                    cfg: MAESBeamConfig) -> MAESBeamState:
    """Fresh survivor state for the segmented API (cfg.max_tokens required)."""
    _validate(rnnt_cfg, cfg)
    if cfg.max_tokens <= 0:
        raise ValueError(
            "maes_state_init: cfg.max_tokens must be set for segmented "
            "decode (the emission buffer cannot default to T)")
    return _fresh_state(pred_params, b, rnnt_cfg, cfg, cfg.max_tokens)


def _apply_reset(pred_params, state: MAESBeamState, reset,
                 rnnt_cfg: RNNTConfig):
    """Re-initialise lanes flagged in ``reset`` (new request joins)."""
    b, k = state.cs.shape
    g0, h0, c0 = _sos_step(pred_params, b, rnnt_cfg)
    fresh_cs = jnp.full((k,), _DEAD, jnp.float32).at[0].set(0.0)
    fresh_dec = jnp.zeros_like(state.dec).at[:, 0].set(g0)
    fresh_h = jnp.zeros_like(state.ph).at[:, 0].set(h0)
    fresh_c = jnp.zeros_like(state.pc).at[:, 0].set(c0)
    r1 = reset[:, None]
    r2 = reset[:, None, None]
    r3 = reset[:, None, None, None]
    return MAESBeamState(
        fidx=jnp.where(reset, 0, state.fidx),
        cs=jnp.where(r1, fresh_cs[None, :], state.cs),
        st=jnp.where(r2, 0, state.st),
        sf=jnp.where(r2, 0, state.sf),
        sc=jnp.where(r1, 0, state.sc),
        dec=jnp.where(r2, fresh_dec, state.dec),
        ph=jnp.where(r3, fresh_h, state.ph),
        pc=jnp.where(r3, fresh_c, state.pc),
    )


def _run_frames(pred_params, joint_params, enc_proj, lane_len, state,
                rnnt_cfg: RNNTConfig, cfg: MAESBeamConfig, n_frames):
    """Advance every lane by up to ``n_frames`` encoder frames."""
    b, t_buf, _ = enc_proj.shape
    k = state.cs.shape[1]
    u_buf = state.st.shape[-1]
    v = rnnt_cfg.num_classes
    m_lab = min(cfg.beam_size + cfg.expansion_beta, v - 1)
    blank = rnnt_cfg.blank_id  # == 0
    lyr, hp = rnnt_cfg.pred_rnn_layers, rnnt_cfg.pred_hidden
    gamma = jnp.float32(cfg.expansion_gamma)
    bi = jnp.arange(b)

    if cfg.topk_impl == "pallas":
        from ..ops.beam_topk import topm_logsoftmax as _topm
    else:
        from ..ops.beam_topk import topm_logsoftmax_xla as _topm

    def joint_rows(enc_row, dec):
        """[B, J] x [B, K, H] -> raw logits [B, K, V] fp32."""
        r = dec.reshape(b * k, -1)
        enc_rows = jnp.broadcast_to(
            enc_row[:, None, :], (b, k, enc_row.shape[-1])).reshape(b * k, -1)
        return joint_step_from_enc_proj(
            joint_params, enc_rows, r, rnnt_cfg).reshape(b, k, v)

    def pred_rows(tokens, pre_h, pre_c):
        """[B, K] tokens + [B, K, L, H] states -> (dec [B,K,H], h, c)."""
        r = b * k
        g, (nh, nc) = predictor_step(
            pred_params, tokens.reshape(r),
            (jnp.transpose(pre_h.reshape(r, lyr, hp), (1, 0, 2)),
             jnp.transpose(pre_c.reshape(r, lyr, hp), (1, 0, 2))),
            rnnt_cfg)
        return (g.reshape(b, k, -1),
                jnp.transpose(nh, (1, 0, 2)).reshape(b, k, lyr, hp),
                jnp.transpose(nc, (1, 0, 2)).reshape(b, k, lyr, hp))

    def topm(logits):
        """[B, K, V] -> (lp_blank [B,K], top_lp [B,K,m], top_tok [B,K,m])."""
        lpb, tl, tt = _topm(logits.reshape(b * k, v), m_lab, blank)
        return (lpb.reshape(b, k), tl.reshape(b, k, m_lab),
                tt.reshape(b, k, m_lab).astype(jnp.int32))

    def prefix_merge(s, st, sc, logits):
        """ESPnet prefix_search, alpha=1: hyp_i (donor, alive) whose label
        sequence is hyp_j's minus its last label donates
        ``score_i + logp_t(missing | dec_i)`` into hyp_j by logaddexp.
        Donor scores are the pre-merge ones (receivers are strictly longer,
        ESPnet's descending-length sweep never boosts a donor first)."""
        alive = s > _ALIVE
        # prefix_eq[b, j, i]: st[b,i,:sc_i] == st[b,j,:sc_i]
        dmask = jnp.arange(u_buf)[None, None, :] < sc[:, :, None]  # [B,i,U]
        eq = st[:, None, :, :] == st[:, :, None, :]  # [B, j, i, U]
        prefix_eq = jnp.all(eq | ~dmask[:, None], axis=-1)
        match = (prefix_eq
                 & (sc[:, :, None] == sc[:, None, :] + 1)
                 & alive[:, :, None] & alive[:, None, :])
        # the label hyp_j has and hyp_i misses: st[b, j, sc_i]
        pos = jnp.clip(sc, 0, u_buf - 1)  # [B, i]
        missing = jnp.take_along_axis(
            st, jnp.broadcast_to(pos[:, None, :], (b, k, k)), axis=2
        )  # [B, j, i]
        # logp of that label under donor i's dec_out: gather logits on the
        # donor axis ([B, i, j] layout) to avoid a [B,K,K,V] broadcast
        logz = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)  # [B,K]
        lg = jnp.take_along_axis(
            logits.astype(jnp.float32),
            jnp.transpose(missing, (0, 2, 1)), axis=2)  # [B, i, j]
        lp = jnp.transpose(lg - logz[:, :, None], (0, 2, 1))  # [B, j, i]
        cand = jnp.where(match, s[:, None, :] + lp, -jnp.inf)  # [B, j, i]
        boost = jax.nn.logsumexp(cand, axis=-1)  # [B, j]
        return jnp.where(
            jnp.any(match, axis=-1), jnp.logaddexp(s, boost), s)

    def take(a, idx):
        """take_along_axis over the beam-slot axis (axis 1)."""
        return jnp.take_along_axis(
            a, idx.reshape(idx.shape + (1,) * (a.ndim - 2)), axis=1)

    def frame_body(fstate):
        """One frame. The expansion steps keep only what the NEXT step
        needs materialized (scores, counts, dec/LSTM state — the predictor
        reads those now); token/frame buffers are never gathered per step.
        Instead each step records (parent, token, write-pos) and ONE merge
        at frame end selects the top-K of every candidate generation
        (step-n blanks + final blank-terminated expansions — strictly the
        same set the per-step lossless merges kept), composes each winner's
        parent chain backward to its root beam slot, gathers the root's
        token/frame rows once, and applies its ≤nstep masked column writes.
        Payload-gather traffic per frame drops from O(nstep·K·U) to
        O(K·U); op count per frame drops ~30% (the loop is op-latency
        bound, not FLOP bound — BENCHMARKS.md)."""
        step, fidx, cs, st, sf, sc, dec, ph, pc = fstate
        in_frame = fidx < lane_len  # [B]
        safe_t = jnp.minimum(fidx, t_buf - 1)
        enc_row = jnp.take_along_axis(
            enc_proj, safe_t[:, None, None], axis=1)[:, 0]  # [B, J]

        # working set registers; generation 0 = the beam
        ws, wsc, wdec, wph, wpc = cs, sc, dec, ph, pc
        blank_s = []  # per-step blank-candidate scores [B, K]
        chain = []  # per-step (parent [B,K], tok [B,K], pos [B,K])
        gen_sc = [sc]
        gen_dec, gen_ph, gen_pc = [dec], [ph], [pc]

        for n in range(cfg.nstep):
            logits = joint_rows(enc_row, wdec)  # [B, K, V]
            if n == 0 and cfg.prefix_alpha:
                ws = prefix_merge(ws, st, sc, logits)
            lp_blank, top_lp, top_tok = topm(logits)

            alive = ws > _ALIVE
            tot_blank = jnp.where(alive, ws + lp_blank, _DEAD)  # [B, K]
            tot_lab = jnp.where(
                alive[:, :, None], ws[:, :, None] + top_lp, _DEAD)
            # per-hypothesis gamma pruning (base: best candidate incl blank)
            best = jnp.maximum(jnp.max(tot_lab, axis=-1), tot_blank)
            keep_b = alive & (tot_blank >= best - gamma)
            keep_l = (tot_lab >= (best - gamma)[:, :, None]) & alive[:, :, None]
            keep_l = keep_l & (wsc < u_buf)[:, :, None]  # emission cap

            blank_s.append(jnp.where(keep_b, tot_blank, _DEAD))

            # ---- global top-K label expansions ---------------------------
            exp_s = jnp.where(keep_l, tot_lab, _DEAD).reshape(b, k * m_lab)
            vals, idx = jax.lax.top_k(exp_s, k)  # [B, K]
            parent = idx // m_lab
            new_alive = vals > _ALIVE
            tok_new = jnp.take_along_axis(
                top_tok.reshape(b, k * m_lab), idx, axis=1)  # [B, K]

            p_sc = take(wsc, parent)
            chain.append((parent, tok_new, p_sc))
            n_dec, n_ph, n_pc = pred_rows(
                tok_new, take(wph, parent), take(wpc, parent))
            ws = jnp.where(new_alive, vals, _DEAD)
            wsc = p_sc + new_alive.astype(jnp.int32)
            wdec, wph, wpc = n_dec, n_ph, n_pc
            gen_sc.append(wsc)
            gen_dec.append(wdec)
            gen_ph.append(wph)
            gen_pc.append(wpc)

        # ---- blank-terminate the surviving expansions --------------------
        # only the blank column of the log-softmax is needed: gather the
        # blank logit and subtract the logsumexp instead of materializing
        # the full [B,K,V] log-probability tensor
        logits = joint_rows(enc_row, wdec).astype(jnp.float32)
        lp_blank = (logits[..., blank]
                    - jax.nn.logsumexp(logits, axis=-1))
        fin_s = jnp.where(ws > _ALIVE, ws + lp_blank, _DEAD)

        # ---- ONE merge over every candidate generation --------------------
        pool = jnp.concatenate(blank_s + [fin_s], axis=1)  # [B, (n+1)K]
        vals, win = jax.lax.top_k(pool, k)
        new_cs = jnp.where(vals > _ALIVE, vals, _DEAD)
        gen = win // k  # candidate generation (nstep = the finals)
        col = win % k  # slot within it

        # non-token payload: gather from the stacked generations
        new_sc = take(jnp.concatenate(gen_sc, axis=1), win)
        n_dec = take(jnp.concatenate(gen_dec, axis=1), win)
        n_ph = take(jnp.concatenate(gen_ph, axis=1), win)
        n_pc = take(jnp.concatenate(gen_pc, axis=1), win)

        # token/frame rows: walk each winner's parent chain back to its
        # root beam slot, recording the one column write per level
        idx = col
        writes = []
        for j in reversed(range(cfg.nstep)):
            applies = gen > j  # winner descends through expansion step j
            parent, tok_j, pos_j = chain[j]
            writes.append((applies,
                           jnp.take_along_axis(tok_j, idx, axis=1),
                           jnp.take_along_axis(pos_j, idx, axis=1)))
            idx = jnp.where(applies, jnp.take_along_axis(parent, idx, axis=1),
                            idx)
        n_st = take(st, idx)
        n_sf = take(sf, idx)
        upos = jnp.arange(u_buf)[None, None, :]
        for applies, tok_w, pos_w in writes:
            put = applies[:, :, None] & (upos == pos_w[:, :, None])
            n_st = jnp.where(put, tok_w[:, :, None], n_st)
            n_sf = jnp.where(put, fidx[:, None, None], n_sf)

        def sel(new, old):
            return jnp.where(
                in_frame.reshape((b,) + (1,) * (new.ndim - 1)), new, old)

        return (step + 1, fidx + in_frame.astype(jnp.int32),
                sel(new_cs, cs), sel(n_st, st), sel(n_sf, sf),
                sel(new_sc, sc), sel(n_dec, dec), sel(n_ph, ph),
                sel(n_pc, pc))

    def frame_cond(fstate):
        return (fstate[0] < n_frames) & jnp.any(fstate[1] < lane_len)

    fstate = (jnp.int32(0), state.fidx, state.cs, state.st, state.sf,
              state.sc, state.dec, state.ph, state.pc)
    fstate = jax.lax.while_loop(frame_cond, frame_body, fstate)
    _, fidx, cs, st, sf, sc, dec, ph, pc = fstate
    return MAESBeamState(fidx=fidx, cs=cs, st=st, sf=sf, sc=sc, dec=dec,
                         ph=ph, pc=pc)


def _select_best(state: MAESBeamState, lane_len, cfg: MAESBeamConfig):
    """ESPnet ``sort_nbest`` selection over the beam."""
    b = state.cs.shape[0]
    bi = jnp.arange(b)
    if cfg.score_norm:
        key = jnp.where(state.cs > _ALIVE,
                        state.cs / (state.sc.astype(jnp.float32) + 1.0),
                        _DEAD)
    else:
        key = state.cs
    best = jnp.argmax(key, axis=1)
    out_counts = jnp.where(lane_len <= 0, 0, state.sc[bi, best])
    return (state.st[bi, best], state.sf[bi, best], out_counts,
            state.cs[bi, best])


@partial(jax.jit, static_argnames=("rnnt_cfg", "cfg"))
def maes_beam_decode(
    pred_params,
    joint_params,
    enc,
    enc_lengths,
    rnnt_cfg: RNNTConfig,
    cfg: MAESBeamConfig = MAESBeamConfig(),
):
    """mAES beam search over a batch.

    Args:
      enc: [B, T, E] fp32; enc_lengths: [B]

    Returns:
      (tokens [B, U] int32, frames [B, U] int32, counts [B] int32,
       scores [B] fp32 raw)
    """
    _validate(rnnt_cfg, cfg)
    b, t, _ = enc.shape
    u_buf = cfg.max_tokens or t
    enc_proj = joint_precompute_enc(joint_params, enc, rnnt_cfg)  # [B, T, J]
    state = _fresh_state(pred_params, b, rnnt_cfg, cfg, u_buf)
    state = _run_frames(pred_params, joint_params, enc_proj, enc_lengths,
                        state, rnnt_cfg, cfg, jnp.int32(t))
    return _select_best(state, enc_lengths, cfg)


@partial(jax.jit, static_argnames=("rnnt_cfg", "cfg", "n_frames"))
def maes_beam_segment(
    pred_params,
    joint_params,
    enc_ring,
    lane_len,
    reset_mask,
    state: MAESBeamState,
    rnnt_cfg: RNNTConfig,
    cfg: MAESBeamConfig,
    n_frames: int,
):
    """Advance every lane by up to ``n_frames`` frames of its own utterance
    (continuous-batching segment; same contract as graves_beam_segment)."""
    state = _apply_reset(pred_params, state, reset_mask, rnnt_cfg)
    return _run_frames(pred_params, joint_params, enc_ring, lane_len,
                       state, rnnt_cfg, cfg, jnp.int32(n_frames))


@partial(jax.jit, static_argnames=("rnnt_cfg", "cfg"))
def maes_finalize(state: MAESBeamState, lane_len,
                  rnnt_cfg: RNNTConfig, cfg: MAESBeamConfig):
    """Best-hypothesis extraction: (tokens, frames, counts, scores)."""
    return _select_best(state, lane_len, cfg)
