"""Graves-style transducer beam search (ESPnet default_beam_search, TPU-native).

The reference's espnet flavor decodes through ``Speech2Text`` with its
defaults — ``BeamSearchTransducer`` search_type "default", beam 20, no LM
(pkg/espnet-asr/src/transcribe.py:27-32,69 passes only lm_weight=0). That
algorithm (Graves 2012, per-frame best-first expansion) is serial: per
encoder frame it repeatedly pops the best pending hypothesis, keeps its
blank extension and pushes its top-``beam`` label extensions, until at least
``beam`` kept hypotheses outscore every pending one. The serial reading is
the oracle (tools/torch_reference.py:espnet_default_beam_reference); this
module executes the SAME algorithm batched on TPU and is gated token-exact
against it (tools/convert_and_gate.py).

Fixed-shape design — a frame-synchronised ``lax.while_loop`` whose body runs
an inner pop loop, every batch element running its own pop state machine:

- each pop appends a node (materialised token/frame row + LSTM states) into
  a per-frame node arena; children reference their parent node, so a pop is
  one [B]-wide predictor step + joint + an O(U) row copy — no unbounded
  structures;
- pending/kept sets live in fixed capacity arrays; masked elements write to
  scratch slots;
- when an element's frame terminates (ESPnet's ``len(kept > max pending) >=
  beam`` test) it idles (masked) while the rest of the batch finishes the
  frame; the survivor compaction — the expensive gather of kept token rows
  and LSTM states into node slots 0..KC-1 — then runs ONCE per frame for the
  whole batch. (An earlier per-element-asynchronous design paid that gather
  on almost every pop iteration, an order of magnitude more HBM traffic than
  the few idle pops the barrier costs.) Frame advance timing is invisible to
  per-element results: pops are element-local, so this is bit-identical to
  the asynchronous schedule and to the serial oracle;
- bounds ESPnet doesn't have, so shapes stay static: ``max_pops_per_frame``
  (default 6·beam+8; on a capped frame survivors are the best ``beam`` kept,
  and ``saturated`` reports it), ``kept_capacity`` (default beam+12; ESPnet
  can carry slightly more than ``beam`` survivors when the pending maximum
  drops late — overflow drops the lowest-scoring), and ``max_tokens``
  (emission buffer, default T). The oracle accepts the same bounds so the
  gate is exact; with real weights none of them bind.

Output selection matches ESPnet ``sort_nbest``: best kept hypothesis by
``score / len(yseq)`` (the leading blank counts — hence counts+1) when
``score_norm``, raw score otherwise.

Continuous batching (segmented decode)
--------------------------------------
Each lane carries its OWN frame clock (``fidx`` is [B], not a scalar), and
the cross-frame state is just the compact survivor slice
(:class:`GravesBeamState`: node slots 0..KC-1 plus scores). That makes the
search resumable in bounded segments:

    state = graves_state_init(b, rnnt_cfg, cfg)          # cfg.max_tokens set
    state = graves_beam_segment(pp, jp, enc_ring, lane_len, reset, state,
                                rnnt_cfg, cfg, n_frames=F)   # F frames/lane
    tokens, frames, counts, scores, sat = graves_finalize(state, lane_len,
                                                          rnnt_cfg, cfg)

Between segments a serving executor swaps finished lanes for queued requests
(write the new utterance's enc projection into the lane's ring rows, flag the
lane in ``reset``) — the continuous-batching counterpart of the reference's
per-utterance serial loop (pkg/espnet-asr/src/transcribe.py:59-78). Pops are
element-local, so per-lane results are bit-identical to a dedicated
whole-utterance decode; ``graves_beam_decode`` itself is the degenerate case
(init → one segment of T frames → finalize) so the oracle-gated serving path
and the segmented path are the same code.
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
    "GravesBeamConfig",
    "GravesBeamState",
    "graves_beam_decode",
    "graves_state_init",
    "graves_beam_segment",
    "graves_finalize",
]

_DEAD = -1.0e30
_ALIVE = -1.0e25


@dataclass(frozen=True)
class GravesBeamConfig:
    beam_size: int = 20
    # select by score / len(yseq) (ESPnet score_norm default True)
    score_norm: bool = True
    # caps making the search fixed-shape (0 -> defaults; see module notes)
    max_pops_per_frame: int = 0  # 0 -> 6*beam + 8
    kept_capacity: int = 0  # 0 -> beam + 12
    max_tokens: int = 0  # 0 -> T (must be set for the segmented API)
    # "pallas": fused log-softmax + blank split + top-k per pop
    # (ops/beam_topk.py); "xla": reference chain. Identical values/order.
    topk_impl: str = "xla"
    # "pallas": fuse the whole per-pop joint tail (pred projection +
    # activation + output matmul + log-softmax + top-k) into ONE kernel
    # (ops/beam_topk.joint_topm); topk_impl is then moot.
    joint_impl: str = "xla"
    # "pallas": fused predictor LSTM cell (ops/lstm_step.py) — one op per
    # layer instead of XLA's ~10; needs pred_hidden % 128 == 0.
    lstm_impl: str = "xla"
    # pops executed per while_loop iteration of the inner pop loop. Exact:
    # every update is frame_done-masked (overshoot pops no-op onto scratch
    # slots). Measured NEUTRAL-to-slightly-negative on the dev TPU (the pop
    # body overlaps the per-iteration overhead), so serving keeps 1; the
    # knob exists for stacks where loop dispatch dominates.
    unroll: int = 1
    # pending hypotheses SPECULATIVELY expanded per inner while_loop
    # iteration (1 = the serial pop loop). The loop is iteration-floor-bound
    # (~80 us/iteration on this stack regardless of body size), so the win
    # comes from cutting ITERATIONS: one batched predictor+joint over the
    # top-``multipop`` pending hypotheses, then the longest prefix the
    # serial algorithm would actually have popped is accepted — exact
    # because a child's score never exceeds its parent's (log-probs are
    # <= 0), so the i-th best pending is popped before any child of pops
    # 1..i-1 iff s_i >= cummax(best child so far), and ESPnet's termination
    # test is evaluated per prefix position with cumulative ops. Outputs are
    # identical to multipop=1 (tested); under blank-dominant frames most
    # rounds accept the full window. MEASURED NEGATIVE at serving scale
    # (B=128 x 20 s, one chip): 3319 ms at multipop=1 vs 4396-4836 ms at
    # 8/16/32 — the round body's [B, M]-row gathers from the node arenas
    # (take_along_axis on [B, N, L, H]) cost more than the saved loop
    # iterations. Stays opt-in; serving keeps 1.
    multipop: int = 1
    # node-arena pop budget for multipop>1, as a multiple of
    # max_pops_per_frame (slot allocation advances by the round's max
    # accepted count, which can exceed any single element's pop count when
    # acceptance is skewed across the batch). On exhaustion the frame ends
    # early for still-active elements and ``saturated`` reports it.
    multipop_arena_factor: float = 1.5


class GravesBeamState(NamedTuple):
    """Cross-segment survivor state (per lane; see module notes).

    ``fidx`` is the lane's next encoder frame (== frames consumed so far);
    the s* arrays are node slots 0..KC-1 of the arena — the kept hypotheses
    compacted at the last frame boundary.
    """

    fidx: jnp.ndarray  # [B] int32
    saturated: jnp.ndarray  # [B] bool
    cs: jnp.ndarray  # [B, KC] fp32 survivor scores (_DEAD = empty slot)
    st: jnp.ndarray  # [B, KC, U] int32 tokens
    sf: jnp.ndarray  # [B, KC, U] int32 emission frames
    sc: jnp.ndarray  # [B, KC] int32 token counts
    slast: jnp.ndarray  # [B, KC] int32 last non-blank token (blank at start)
    sph: jnp.ndarray  # [B, KC, L, H] fp32 pre-step LSTM h
    spc: jnp.ndarray  # [B, KC, L, H] fp32 pre-step LSTM c
    # pop-budget telemetry (sizes max_pops_per_frame from real traffic —
    # tools/run_real_parity.py emission stats):
    pmax: jnp.ndarray  # [B] int32 max pops in any single frame so far
    ptot: jnp.ndarray  # [B] int32 total pops across all frames


def _dims(rnnt_cfg: RNNTConfig, cfg: GravesBeamConfig, t_default: int):
    """Static sizes shared by the full and segmented entry points."""
    v = rnnt_cfg.num_classes
    k = min(cfg.beam_size, v)
    beam_k = min(k, v - 1)
    p_max = cfg.max_pops_per_frame or (6 * k + 8)
    kc = cfg.kept_capacity or (k + 12)
    u_buf = cfg.max_tokens or t_default
    m_pop = max(1, min(cfg.multipop, p_max))
    if m_pop > 1:
        # arena slots advance by each round's max accepted count (see
        # round_body); budget beyond p_max absorbs cross-batch skew, the
        # final m_pop rows are an overflow scratch window never referenced
        cap_pops = max(p_max, int(p_max * cfg.multipop_arena_factor + 0.5))
        n_nodes = kc + cap_pops + 2 * m_pop
        c_pend = kc + (cap_pops + 2 * m_pop) * beam_k
    else:
        cap_pops = p_max
        n_nodes = kc + p_max + 1  # +1 scratch row
        c_pend = kc + p_max * beam_k + beam_k  # + scratch block
    return (v, k, beam_k, p_max, kc, u_buf, m_pop, cap_pops, n_nodes, c_pend,
            rnnt_cfg.pred_rnn_layers, rnnt_cfg.pred_hidden)


def _validate(rnnt_cfg: RNNTConfig):
    if rnnt_cfg.predictor_kind != "lstm":
        raise NotImplementedError("graves beam search: LSTM predictors only")
    if not rnnt_cfg.blank_first:
        raise NotImplementedError("espnet convention: blank id 0")


def _fresh_state(b, rnnt_cfg: RNNTConfig, cfg: GravesBeamConfig, u_buf):
    _, _, _, _, kc, _, _, _, _, _, lyr, h = _dims(rnnt_cfg, cfg, u_buf)
    cs = jnp.full((b, kc), _DEAD, jnp.float32).at[:, 0].set(0.0)
    return GravesBeamState(
        fidx=jnp.zeros((b,), jnp.int32),
        saturated=jnp.zeros((b,), bool),
        cs=cs,
        st=jnp.zeros((b, kc, u_buf), jnp.int32),
        sf=jnp.zeros((b, kc, u_buf), jnp.int32),
        sc=jnp.zeros((b, kc), jnp.int32),
        slast=jnp.full((b, kc), rnnt_cfg.blank_id, jnp.int32),
        sph=jnp.zeros((b, kc, lyr, h), jnp.float32),
        spc=jnp.zeros((b, kc, lyr, h), jnp.float32),
        pmax=jnp.zeros((b,), jnp.int32),
        ptot=jnp.zeros((b,), jnp.int32),
    )


def graves_state_init(b, rnnt_cfg: RNNTConfig,
                      cfg: GravesBeamConfig) -> GravesBeamState:
    """Fresh survivor state for the segmented API (cfg.max_tokens required —
    segments can't default the emission buffer to T)."""
    _validate(rnnt_cfg)
    if cfg.max_tokens <= 0:
        raise ValueError(
            "graves_state_init: cfg.max_tokens must be set for segmented "
            "decode (the emission buffer cannot default to T)")
    return _fresh_state(b, rnnt_cfg, cfg, cfg.max_tokens)


def _apply_reset(state: GravesBeamState, reset, rnnt_cfg: RNNTConfig):
    """Re-initialise lanes flagged in ``reset`` (new request joins)."""
    b, kc = state.cs.shape
    fresh_cs = jnp.full((kc,), _DEAD, jnp.float32).at[0].set(0.0)
    r1 = reset[:, None]
    r2 = reset[:, None, None]
    r3 = reset[:, None, None, None]
    return GravesBeamState(
        fidx=jnp.where(reset, 0, state.fidx),
        saturated=jnp.where(reset, False, state.saturated),
        cs=jnp.where(r1, fresh_cs[None, :], state.cs),
        st=jnp.where(r2, 0, state.st),
        sf=jnp.where(r2, 0, state.sf),
        sc=jnp.where(r1, 0, state.sc),
        slast=jnp.where(r1, rnnt_cfg.blank_id, state.slast),
        sph=jnp.where(r3, 0.0, state.sph),
        spc=jnp.where(r3, 0.0, state.spc),
        pmax=jnp.where(reset, 0, state.pmax),
        ptot=jnp.where(reset, 0, state.ptot),
    )


def _run_frames(pred_params, joint_params, enc_proj, lane_len, state,
                rnnt_cfg: RNNTConfig, cfg: GravesBeamConfig, n_frames):
    """Advance every lane by up to ``n_frames`` encoder frames (lanes stop at
    their own ``lane_len``). Traced inside the jitted entry points."""
    b, t_buf, _ = enc_proj.shape
    (v, k, beam_k, p_max, kc, u_buf, m_pop, cap_pops, n_nodes, c_pend,
     lyr, h) = _dims(rnnt_cfg, cfg, state.st.shape[-1])
    blank = rnnt_cfg.blank_id  # == 0

    use_lstm_kernel = (
        cfg.lstm_impl == "pallas" and rnnt_cfg.pred_hidden % 128 == 0
    )

    def pred_step_bk(tokens, pre_h, pre_c):
        """One predictor step; states [B, L, H] (the arena's node layout).

        Returns (dec_out [B, H] fp32, post_h [B, L, H], post_c [B, L, H]).
        """
        if use_lstm_kernel:
            from ..models.rnnt import _embed_tokens
            from ..ops.lstm_step import lstm_cell_step

            # fp32 in-kernel: launch-bound per-pop matmuls, fp32 is free and
            # tracks the fp32 oracle closer than the XLA bf16 chain
            x = _embed_tokens(pred_params, tokens, rnnt_cfg)
            x = x.astype(jnp.float32)
            hs, cs_ = [], []
            for li, layer in enumerate(pred_params["lstm"]):
                hn, cn = lstm_cell_step(
                    layer["w_ih"], layer["w_hh"],
                    layer["b_ih"] + layer["b_hh"],
                    x, pre_h[:, li], pre_c[:, li],
                    compute_dtype="float32",
                )
                hs.append(hn)
                cs_.append(cn)
                x = hn
            return x, jnp.stack(hs, axis=1), jnp.stack(cs_, axis=1)
        dec_out, (post_h, post_c) = predictor_step(
            pred_params, tokens,
            (jnp.transpose(pre_h, (1, 0, 2)),
             jnp.transpose(pre_c, (1, 0, 2))),
            rnnt_cfg,
        )
        return (dec_out,
                jnp.transpose(post_h, (1, 0, 2)),
                jnp.transpose(post_c, (1, 0, 2)))

    def joint_topm_pop(enc_rows, dec_rows):
        """Per-pop joint tail -> (lp_blank, top_lp, top_tok)."""
        if cfg.joint_impl == "pallas":
            from ..ops.beam_topk import joint_topm

            return joint_topm(
                joint_params["pred"]["w"], joint_params["pred"]["b"],
                joint_params["out"]["w"], joint_params["out"]["b"],
                enc_rows, dec_rows, beam_k, blank,
                activation=rnnt_cfg.joint_activation,
                compute_dtype="float32",  # launch-bound; fp32 is free here
            )
        logits = joint_step_from_enc_proj(
            joint_params, enc_rows, dec_rows, rnnt_cfg
        )  # [B, V]
        if cfg.topk_impl == "pallas":
            from ..ops.beam_topk import topm_logsoftmax as _topm
        else:
            from ..ops.beam_topk import topm_logsoftmax_xla as _topm
        return _topm(logits, beam_k, blank)

    # ---- arenas: survivors at slots 0..kc-1, per-frame scratch beyond -----
    def arena(slice_, depth_shape, dtype, fill=0):
        a = jnp.full((b, n_nodes) + depth_shape, fill, dtype)
        return a.at[:, :kc].set(slice_)

    nt = arena(state.st, (u_buf,), jnp.int32)
    nf = arena(state.sf, (u_buf,), jnp.int32)
    nc = arena(state.sc, (), jnp.int32)
    nlast = arena(state.slast, (), jnp.int32, fill=blank)
    npre_h = arena(state.sph, (lyr, h), jnp.float32)
    npre_c = arena(state.spc, (lyr, h), jnp.float32)
    npost_h = jnp.zeros((b, n_nodes, lyr, h), jnp.float32)
    npost_c = jnp.zeros((b, n_nodes, lyr, h), jnp.float32)
    cs = state.cs
    saturated = state.saturated
    fidx0 = state.fidx
    pmax0, ptot0 = state.pmax, state.ptot

    bi = jnp.arange(b)

    def frame_body(fstate):
        """One encoder frame per still-active lane: run pops until every
        lane's frame terminated, then compact survivors once."""
        (step, fidx, saturated, nt, nf, nc, nlast,
         npre_h, npre_c, npost_h, npost_c, cs, pmax, ptot) = fstate

        in_frame = fidx < lane_len  # [B]
        # the frame's enc-projection row, per lane (loop-invariant for the
        # pop loop below — fetched ONCE per frame, not per pop)
        safe_t = jnp.minimum(fidx, t_buf - 1)
        enc_row = jnp.take_along_axis(
            enc_proj, safe_t[:, None, None], axis=1)[:, 0]  # [B, J]

        # fresh per-frame sets: pending = survivors, kept empty
        ps = jnp.full((b, c_pend), _DEAD, jnp.float32).at[:, :kc].set(
            jnp.where(in_frame[:, None], cs, _DEAD))
        pnode = jnp.zeros((b, c_pend), jnp.int32).at[:, :kc].set(
            jnp.arange(kc)[None, :])
        ptok = jnp.full((b, c_pend), -1, jnp.int32)
        ks = jnp.full((b, p_max + 1), _DEAD, jnp.float32)
        knode = jnp.zeros((b, p_max + 1), jnp.int32)
        pop_i = jnp.zeros((b,), jnp.int32)
        it0 = jnp.int32(0)
        frame_done = ~in_frame

        def pop_cond(pstate):
            return ~jnp.all(pstate[0])

        def pop_body(pstate):
            (frame_done, pop_i, it, saturated,
             nt, nf, nc, nlast, npre_h, npre_c, npost_h, npost_c,
             ps, pnode, ptok, ks, knode) = pstate

            active = ~frame_done

            # ---- pop the best pending hypothesis -------------------------
            sel_idx = jnp.argmax(ps, axis=1)  # [B]
            score = ps[bi, sel_idx]
            ps = ps.at[bi, jnp.where(active, sel_idx, c_pend - 1)].set(_DEAD)
            node = pnode[bi, sel_idx]
            tok = ptok[bi, sel_idx]
            is_ext = tok >= 0

            pre_h = jnp.where(is_ext[:, None, None],
                              npost_h[bi, node], npre_h[bi, node])  # [B,L,H]
            pre_c = jnp.where(is_ext[:, None, None],
                              npost_c[bi, node], npre_c[bi, node])
            last = jnp.where(is_ext, tok, nlast[bi, node])
            cnt = nc[bi, node] + is_ext.astype(jnp.int32)

            dec_out, post_h, post_c = pred_step_bk(last, pre_h, pre_c)

            # ---- node materialisation ------------------------------------
            # EVERY pop materialises a fresh node at the GLOBAL slot kc+it
            # (while an element is active its pop count equals the loop
            # iteration, so the numbering is the per-element scheme exactly;
            # survivor pops write a copy-node whose npost is the freshly
            # stepped state their children read). One dynamic_update_slice
            # per arena replaces the old .at[bi, q].set batch scatter, whose
            # TPU lowering rewrote the WHOLE arena as a dense select —
            # profiled at ~120 of 188 us per pop (fusion.204/199, round 3).
            # Lanes of frame_done elements receive garbage at slot kc+it;
            # nothing references them (their kept/pending entries only point
            # at nodes written while they were active, all at slots < kc+it).
            q = jnp.full((b,), kc, jnp.int32) + it
            upos = jnp.arange(u_buf)[None, :]
            put = is_ext[:, None] & (upos == nc[bi, node][:, None])
            row_t = jnp.where(put, tok[:, None], nt[bi, node])
            row_f = jnp.where(put, fidx[:, None], nf[bi, node])

            def dus(arena, row):
                start = (0, kc + it) + (0,) * (arena.ndim - 2)
                return jax.lax.dynamic_update_slice(
                    arena, row[:, None], start)

            nt = dus(nt, row_t)
            nf = dus(nf, row_f)
            nc = dus(nc, cnt)
            nlast = dus(nlast, last)
            npre_h = dus(npre_h, pre_h)
            npre_c = dus(npre_c, pre_c)
            npost_h = dus(npost_h, post_h)
            npost_c = dus(npost_c, post_c)

            # ---- joint + log-probs ---------------------------------------
            lp_blank, top_lp, top_tok = joint_topm_pop(enc_row, dec_out)

            # ---- kept: blank extension -----------------------------------
            # kept count == it for active elements, so this is a DUS too;
            # frame_done elements must keep their kept sets frozen -> their
            # lane writes _DEAD (a live garbage score would change their
            # compaction)
            ks = jax.lax.dynamic_update_slice(
                ks, jnp.where(active, score + lp_blank, _DEAD)[:, None],
                (0, it))
            knode = jax.lax.dynamic_update_slice(knode, q[:, None], (0, it))

            # ---- pending: top-k label extensions -------------------------
            can_ext = active & (cnt < u_buf)
            child_scores = jnp.where(
                can_ext[:, None], score[:, None] + top_lp, _DEAD)
            base = kc + it * beam_k
            ps = jax.lax.dynamic_update_slice(ps, child_scores, (0, base))
            pnode = jax.lax.dynamic_update_slice(
                pnode, jnp.broadcast_to(q[:, None], (b, beam_k)), (0, base))
            ptok = jax.lax.dynamic_update_slice(
                ptok, top_tok.astype(jnp.int32), (0, base))
            pop_i = pop_i + active.astype(jnp.int32)

            # ---- ESPnet termination test ---------------------------------
            hyps_max = jnp.max(ps, axis=1)
            n_above = jnp.sum(ks > hyps_max[:, None], axis=1)
            hit_cap = pop_i >= p_max
            frame_done = frame_done | (active & ((n_above >= k) | hit_cap))
            saturated = saturated | (active & hit_cap & (n_above < k))

            return (frame_done, pop_i, it + 1, saturated,
                    nt, nf, nc, nlast, npre_h, npre_c, npost_h, npost_c,
                    ps, pnode, ptok, ks, knode)

        def round_body(pstate):
            """Expand the top-``m_pop`` pending hypotheses in ONE batched
            predictor+joint, then accept exactly the prefix the serial
            algorithm would have popped. Identical outputs to pop_body
            (tested); ~m_pop fewer while_loop iterations per frame, which is
            the cost driver (the loop floor is ~80 us/iteration regardless
            of body size). Exactness argument: children score <= parent
            (log-probs <= 0) and child pending columns are always HIGHER
            than every snapshot entry's, so rank-i of the snapshot is popped
            before any child of ranks 1..i-1 iff s_i >= cummax(best child),
            ties to the snapshot — exactly serial argmax order."""
            (frame_done, pop_i, nbase, saturated,
             nt, nf, nc, nlast, npre_h, npre_c, npost_h, npost_c,
             ps, pnode, ptok, ks, knode) = pstate

            active = ~frame_done
            # overflow: no legal write window left -> this round accepts
            # nothing, writes land in the tail scratch rows, still-active
            # elements end their frame flagged saturated
            ovf = nbase + m_pop > kc + cap_pops + m_pop
            nbase_s = jnp.where(
                ovf, jnp.int32(kc + cap_pops + m_pop), nbase)

            # ---- top-M pending snapshot (value desc, index asc == the
            # serial argmax pop order, including ties)
            vals, idx = jax.lax.top_k(ps, m_pop + 1)
            s = vals[:, :m_pop]  # [B, M]
            idxm = idx[:, :m_pop]
            p_rest = vals[:, m_pop]  # best pending beyond the window

            node = jnp.take_along_axis(pnode, idxm, axis=1)  # [B, M]
            tok = jnp.take_along_axis(ptok, idxm, axis=1)
            is_ext = tok >= 0

            def prow(x):
                return jnp.take_along_axis(
                    x, node.reshape(node.shape + (1,) * (x.ndim - 2)),
                    axis=1)

            pre_h = jnp.where(is_ext[:, :, None, None],
                              prow(npost_h), prow(npre_h))  # [B,M,L,H]
            pre_c = jnp.where(is_ext[:, :, None, None],
                              prow(npost_c), prow(npre_c))
            last = jnp.where(is_ext, tok, prow(nlast))  # [B, M]
            cnt_parent = prow(nc)
            cnt = cnt_parent + is_ext.astype(jnp.int32)

            bm = b * m_pop
            dec_out, post_h, post_c = pred_step_bk(
                last.reshape(bm),
                pre_h.reshape(bm, lyr, h), pre_c.reshape(bm, lyr, h))

            enc_rows = jnp.broadcast_to(
                enc_row[:, None, :],
                (b, m_pop, enc_row.shape[-1])).reshape(bm, -1)
            lp_blank, top_lp, top_tok = joint_topm_pop(enc_rows, dec_out)
            lp_blank = lp_blank.reshape(b, m_pop)
            top_lp = top_lp.reshape(b, m_pop, beam_k)
            top_tok = top_tok.reshape(b, m_pop, beam_k).astype(jnp.int32)

            # ---- serial-order accounting --------------------------------
            kb = s + lp_blank  # kept (blank-extension) score per pop
            can_ext = cnt < u_buf
            c_best = jnp.where(can_ext, s + top_lp[:, :, 0], _DEAD)
            inc_cmax = jax.lax.cummax(c_best, axis=1)
            exc_cmax = jnp.concatenate(
                [jnp.full((b, 1), -jnp.inf, jnp.float32),
                 inc_cmax[:, :-1]], axis=1)
            valid = s >= exc_cmax
            vpfx = jnp.cumprod(valid.astype(jnp.int32), axis=1).astype(bool)

            # max pending AFTER pop i (children of pops 1..i included)
            s_shift = jnp.concatenate([s[:, 1:], p_rest[:, None]], axis=1)
            m_after = jnp.maximum(s_shift, inc_cmax)  # [B, M]
            n_old = jnp.sum(ks[:, None, :] > m_after[:, :, None], axis=2)
            tri = jnp.tril(jnp.ones((m_pop, m_pop), bool))  # [i, j]: j <= i
            n_new = jnp.sum(
                (kb[:, None, :] > m_after[:, :, None]) & tri[None], axis=2)
            term = (n_old + n_new) >= k
            i1 = 1 + jnp.arange(m_pop, dtype=jnp.int32)
            cap = (pop_i[:, None] + i1[None, :]) >= p_max
            done_eff = vpfx & (term | cap)
            any_done = jnp.any(done_eff, axis=1)
            first = jnp.argmax(done_eff, axis=1)  # [B]
            a_cnt = jnp.where(
                any_done, first + 1, jnp.sum(vpfx.astype(jnp.int32), axis=1))
            a_cnt = jnp.where(active & ~ovf, a_cnt, 0)
            acc = jnp.arange(m_pop)[None, :] < a_cnt[:, None]  # [B, M]

            sat_i = jnp.take_along_axis(
                cap & ~term, first[:, None], axis=1)[:, 0]
            saturated = saturated | (active & ~ovf & any_done & sat_i)
            saturated = saturated | (active & ovf)
            frame_done = frame_done | (active & (ovf | any_done))

            # ---- apply the accepted prefix ------------------------------
            # pending removal (ps is small — the scatter's dense-select
            # lowering is fine here, unlike on the node arenas)
            ps = ps.at[bi[:, None], idxm].set(jnp.where(acc, _DEAD, s))

            # kept appends at per-element columns pop_i + j (same columns
            # the serial pop loop uses)
            tgt = pop_i[:, None] + jnp.arange(m_pop, dtype=jnp.int32)[None]
            cols = jnp.arange(p_max + 1, dtype=jnp.int32)
            hit = (cols[None, None, :] == tgt[:, :, None]) & acc[:, :, None]
            hit_any = jnp.any(hit, axis=1)
            qv = nbase_s + jnp.arange(m_pop, dtype=jnp.int32)  # node slots
            ks = jnp.where(
                hit_any,
                jnp.sum(jnp.where(hit, kb[:, :, None], 0.0), axis=1), ks)
            knode = jnp.where(
                hit_any,
                jnp.sum(jnp.where(hit, qv[None, :, None], 0), axis=1), knode)

            # children at batch-uniform columns; unaccepted pops' blocks are
            # _DEAD and sit past every element's accepted region, so the
            # next round's base may overwrite them
            cbase = kc + (nbase_s - kc) * beam_k
            child_s = jnp.where((acc & can_ext)[:, :, None],
                                s[:, :, None] + top_lp, _DEAD)
            ps = jax.lax.dynamic_update_slice(
                ps, child_s.reshape(b, m_pop * beam_k), (0, cbase))
            child_n = jnp.broadcast_to(
                qv[None, :, None], (b, m_pop, beam_k))
            pnode = jax.lax.dynamic_update_slice(
                pnode, child_n.reshape(b, -1), (0, cbase))
            ptok = jax.lax.dynamic_update_slice(
                ptok, top_tok.reshape(b, -1), (0, cbase))

            # node arena: ONE [B, M, ...] dynamic_update_slice per array
            upos = jnp.arange(u_buf)[None, None, :]
            put = is_ext[:, :, None] & (upos == cnt_parent[:, :, None])
            row_t = jnp.where(put, tok[:, :, None], prow(nt))
            row_f = jnp.where(put, fidx[:, None, None], prow(nf))

            def dusm(arena, blk):
                start = (0, nbase_s) + (0,) * (arena.ndim - 2)
                return jax.lax.dynamic_update_slice(arena, blk, start)

            nt = dusm(nt, row_t)
            nf = dusm(nf, row_f)
            nc = dusm(nc, cnt)
            nlast = dusm(nlast, last)
            npre_h = dusm(npre_h, pre_h)
            npre_c = dusm(npre_c, pre_c)
            npost_h = dusm(npost_h, post_h.reshape(b, m_pop, lyr, h))
            npost_c = dusm(npost_c, post_c.reshape(b, m_pop, lyr, h))

            pop_i = pop_i + a_cnt
            nbase = jnp.where(ovf, nbase, nbase + jnp.max(a_cnt))
            return (frame_done, pop_i, nbase, saturated,
                    nt, nf, nc, nlast, npre_h, npre_c, npost_h, npost_c,
                    ps, pnode, ptok, ks, knode)

        if m_pop > 1:
            pstate = (frame_done, pop_i, jnp.int32(kc), saturated,
                      nt, nf, nc, nlast, npre_h, npre_c, npost_h, npost_c,
                      ps, pnode, ptok, ks, knode)
            pstate = jax.lax.while_loop(pop_cond, round_body, pstate)
            (frame_done, pop_i, _, saturated,
             nt, nf, nc, nlast, npre_h, npre_c, npost_h, npost_c,
             ps, pnode, ptok, ks, knode) = pstate
        else:
            pstate = (frame_done, pop_i, it0, saturated,
                      nt, nf, nc, nlast, npre_h, npre_c, npost_h, npost_c,
                      ps, pnode, ptok, ks, knode)

            def pop_body_n(s):
                for _ in range(max(1, cfg.unroll)):
                    s = pop_body(s)
                return s

            pstate = jax.lax.while_loop(pop_cond, pop_body_n, pstate)
            (frame_done, pop_i, _, saturated,
             nt, nf, nc, nlast, npre_h, npre_c, npost_h, npost_c,
             ps, pnode, ptok, ks, knode) = pstate

        # ---- compact survivors into node slots 0..kc-1 (once per frame) --
        hyps_max = jnp.max(ps, axis=1)  # [B]
        above = ks > hyps_max[:, None]  # [B, P+1]
        thr_ok = jnp.sum(above, axis=1) >= k  # termination vs pop-cap exit

        masked = jnp.where(thr_ok[:, None], jnp.where(above, ks, _DEAD), ks)
        vals, idx = jax.lax.top_k(masked, kc)  # [B, KC]
        pos_ok = thr_ok[:, None] | (jnp.arange(kc)[None, :] < k)
        valid = (vals > _ALIVE) & pos_ok
        new_cs = jnp.where(valid, vals, _DEAD)
        src = jnp.take_along_axis(knode, idx, axis=1)  # [B, KC] node ids

        def rows(x):
            return jnp.take_along_axis(
                x, src.reshape(src.shape + (1,) * (x.ndim - 2)), axis=1
            )

        sel = lambda new, old: jnp.where(
            in_frame.reshape((b,) + (1,) * (new.ndim - 1)), new, old)

        nt = nt.at[:, :kc].set(sel(rows(nt), nt[:, :kc]))
        nf = nf.at[:, :kc].set(sel(rows(nf), nf[:, :kc]))
        nc = nc.at[:, :kc].set(sel(rows(nc), nc[:, :kc]))
        nlast = nlast.at[:, :kc].set(sel(rows(nlast), nlast[:, :kc]))
        npre_h = npre_h.at[:, :kc].set(sel(rows(npre_h), npre_h[:, :kc]))
        npre_c = npre_c.at[:, :kc].set(sel(rows(npre_c), npre_c[:, :kc]))
        cs = jnp.where(in_frame[:, None], new_cs, cs)

        # pop telemetry: pop_i is 0 for lanes that sat this frame out
        pmax = jnp.maximum(pmax, pop_i)
        ptot = ptot + pop_i

        return (step + 1, fidx + in_frame.astype(jnp.int32), saturated,
                nt, nf, nc, nlast, npre_h, npre_c, npost_h, npost_c, cs,
                pmax, ptot)

    def frame_cond(fstate):
        return (fstate[0] < n_frames) & jnp.any(fstate[1] < lane_len)

    fstate = (jnp.int32(0), fidx0, saturated, nt, nf, nc, nlast,
              npre_h, npre_c, npost_h, npost_c, cs, pmax0, ptot0)
    fstate = jax.lax.while_loop(frame_cond, frame_body, fstate)
    (_, fidx, saturated, nt, nf, nc, nlast,
     npre_h, npre_c, npost_h, npost_c, cs, pmax, ptot) = fstate

    return GravesBeamState(
        fidx=fidx, saturated=saturated, cs=cs,
        st=nt[:, :kc], sf=nf[:, :kc], sc=nc[:, :kc], slast=nlast[:, :kc],
        sph=npre_h[:, :kc], spc=npre_c[:, :kc],
        pmax=pmax, ptot=ptot,
    )


def _select_best(state: GravesBeamState, lane_len,
                 cfg: GravesBeamConfig):
    """ESPnet ``sort_nbest`` selection over the survivor slice."""
    b = state.cs.shape[0]
    bi = jnp.arange(b)
    counts_kc = state.sc
    if cfg.score_norm:
        key = jnp.where(state.cs > _ALIVE,
                        state.cs / (counts_kc.astype(jnp.float32) + 1.0),
                        _DEAD)
    else:
        key = state.cs
    best = jnp.argmax(key, axis=1)  # [B]
    out_tokens = state.st[bi, best]
    out_frames = state.sf[bi, best]
    out_counts = counts_kc[bi, best]
    out_scores = state.cs[bi, best]
    # empty-input rows: nothing decoded
    out_counts = jnp.where(lane_len <= 0, 0, out_counts)
    return out_tokens, out_frames, out_counts, out_scores, state.saturated


@partial(jax.jit, static_argnames=("rnnt_cfg", "cfg"))
def graves_beam_decode(
    pred_params,
    joint_params,
    enc,
    enc_lengths,
    rnnt_cfg: RNNTConfig,
    cfg: GravesBeamConfig = GravesBeamConfig(),
):
    """ESPnet default beam search over a batch.

    Args:
      enc: [B, T, E] fp32; enc_lengths: [B]

    Returns:
      (tokens [B, U] int32, frames [B, U] int32, counts [B] int32,
       scores [B] fp32 raw, saturated [B] bool — True if any frame hit
       max_pops_per_frame before ESPnet's termination test)
    """
    _validate(rnnt_cfg)
    b, t, e = enc.shape
    u_buf = cfg.max_tokens or t
    enc_proj = joint_precompute_enc(joint_params, enc, rnnt_cfg)  # [B, T, J]
    state = _fresh_state(b, rnnt_cfg, cfg, u_buf)
    state = _run_frames(pred_params, joint_params, enc_proj, enc_lengths,
                        state, rnnt_cfg, cfg, jnp.int32(t))
    return _select_best(state, enc_lengths, cfg)


@partial(jax.jit, static_argnames=("rnnt_cfg", "cfg"))
def graves_beam_decode_stats(
    pred_params,
    joint_params,
    enc,
    enc_lengths,
    rnnt_cfg: RNNTConfig,
    cfg: GravesBeamConfig = GravesBeamConfig(),
):
    """:func:`graves_beam_decode` plus pop-budget telemetry.

    Returns the decode 5-tuple followed by ``(pmax [B], ptot [B])`` — the
    max pops any single frame needed and the total pops per element. Sizes
    ``max_pops_per_frame`` against real-weight emission density
    (tools/run_real_parity.py) instead of the modeled worst case.
    """
    _validate(rnnt_cfg)
    b, t, e = enc.shape
    u_buf = cfg.max_tokens or t
    enc_proj = joint_precompute_enc(joint_params, enc, rnnt_cfg)
    state = _fresh_state(b, rnnt_cfg, cfg, u_buf)
    state = _run_frames(pred_params, joint_params, enc_proj, enc_lengths,
                        state, rnnt_cfg, cfg, jnp.int32(t))
    return _select_best(state, enc_lengths, cfg) + (state.pmax, state.ptot)


@partial(jax.jit, static_argnames=("rnnt_cfg", "cfg", "n_frames"))
def graves_beam_segment(
    pred_params,
    joint_params,
    enc_ring,
    lane_len,
    reset_mask,
    state: GravesBeamState,
    rnnt_cfg: RNNTConfig,
    cfg: GravesBeamConfig,
    n_frames: int,
):
    """Advance every lane by up to ``n_frames`` frames of its own utterance.

    Args:
      enc_ring: [B, T_buf, J] per-lane joint enc projections
        (``joint_precompute_enc`` of each lane's utterance, written at rows
        0..len-1 of its lane)
      lane_len: [B] int32 — valid frames per lane (0 = idle lane)
      reset_mask: [B] bool — lanes re-initialised before stepping (a new
        request was swapped in)
      state: survivor state from ``graves_state_init`` / a prior segment

    Returns the updated :class:`GravesBeamState`. A lane is finished when
    ``state.fidx >= lane_len``; per-lane results are bit-identical to a
    dedicated ``graves_beam_decode`` of the same utterance.
    """
    state = _apply_reset(state, reset_mask, rnnt_cfg)
    return _run_frames(pred_params, joint_params, enc_ring, lane_len,
                       state, rnnt_cfg, cfg, jnp.int32(n_frames))


@partial(jax.jit, static_argnames=("rnnt_cfg", "cfg"))
def graves_finalize(state: GravesBeamState, lane_len,
                    rnnt_cfg: RNNTConfig, cfg: GravesBeamConfig):
    """Best-hypothesis extraction for (any subset of) lanes: returns
    (tokens [B, U], frames [B, U], counts [B], scores [B], saturated [B])."""
    return _select_best(state, lane_len, cfg)
