"""Pruned / simple transducer losses (k2-style semantics, TPU-native).

The flagship train step's memory wall is the materialized ``[B,T,U+1,V]``
joint that feeds ``losses.rnnt_loss`` (tools/tpu_train_bench.py caps at
B=4x15 s on one 16 GB chip because of it). This module implements the
standard mechanism that removes that bound — the pruned-transducer loss
pair of Kuang et al., "Pruned RNN-T for fast, memory-efficient ASR
training" (Interspeech 2022), the objective icefall trains the zipformer
flavor's checkpoints with (the reference consumes those checkpoints via
sherpa-onnx, pkg/k2-asr/src/huggingface.py:73-83; it ships no trainer) —
re-derived for the TPU rather than ported from k2's CUDA kernels:

1. ``rnnt_loss_simple`` — a trivial joiner ``logit(t,u,v) = am[t,v] +
   lm[u,v]``. Because the score decomposes over (t, u), the per-cell
   normalizer ``Z[t,u] = logsumexp_v(am[t,v] + lm[u,v])`` is a single MXU
   matmul of exponentials: ``log(exp(am - am_max) @ exp(lm - lm_max)^T)
   + am_max + lm_max``. Nothing of shape T*U*V ever exists — peak memory
   is O(B*T*U) — and the contraction runs on the systolic array. The
   lattice DP is the shared anti-diagonal wavefront
   (``losses.transducer_nll_from_transitions``).
2. ``prune_ranges`` — per-frame windows of ``s_range`` label positions
   around the probable alignment. k2 extracts the occupancies from a
   hand-written backward; here one ``jax.grad`` of the simple NLL with
   respect to the transition log-probs yields exactly those posteriors
   (d NLL / d lp[t,u] = -gamma[t,u]), and the window placement is a
   windowed-mass argmax followed by three vectorized monotone
   projections (cummax / running-min ramp / boundary ramp) instead of a
   serial adjustment loop.
3. ``rnnt_loss_pruned`` — the full non-linear joint evaluated only on the
   gathered ``[B,T,s_range,V]`` band, with a window-relative wavefront DP
   (lax.scan over frames; the s_range-step in-row label accumulation is
   unrolled — s_range is ~5).

With ``s_range=5`` and V=3000 the pruned band is ~(U+1)/5 / 1 the full
joint's size per frame — in practice a >10x cut of the dominant training
buffer, which is what lets the train step scale past the B=4 bound.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .losses import _NEG_INF, transducer_nll_from_transitions

__all__ = [
    "init_simple_joint",
    "simple_transitions",
    "rnnt_loss_simple",
    "prune_ranges",
    "rnnt_loss_pruned",
    "pruned_loss_bundle",
]


def init_simple_joint(key, cfg):
    """Parameters of the trivial joiner: two projections to the logit
    space (icefall's ``simple_am_proj`` / ``simple_lm_proj``)."""
    from ..models.layers import dense_init

    k1, k2 = jax.random.split(key)
    return {
        "am": dense_init(k1, cfg.enc_dim, cfg.num_classes),
        "lm": dense_init(k2, cfg.pred_hidden, cfg.num_classes),
    }


def simple_transitions(am, lm, labels, blank_id):
    """Per-cell transition log-probs of the trivial joiner, without the
    [B,T,U+1,V] tensor.

    Args:
      am: [B, T, V] frame logits (unnormalized)
      lm: [B, U+1, V] label-context logits (unnormalized)
      labels: [B, U] int32
      blank_id: blank logit index

    Returns:
      (lp_blank [B,T,U+1], lp_label [B,T,U]) — normalized per cell:
      lp(v | t, u) = am[t,v] + lm[u,v] - logsumexp_v(am[t,·] + lm[u,·]).
    """
    am = am.astype(jnp.float32)
    lm = lm.astype(jnp.float32)
    am_max = jnp.max(am, axis=-1)  # [B, T]
    lm_max = jnp.max(lm, axis=-1)  # [B, U+1]
    # Z via one MXU contraction of exponentials. exp args are <= 0 so the
    # products are in (0, 1]; the sum over V stays comfortably fp32. The
    # contraction feeds a log -> HIGHEST precision (bf16 mantissas would
    # bleed straight into the loss).
    s = jnp.einsum(
        "btv,buv->btu", jnp.exp(am - am_max[..., None]),
        jnp.exp(lm - lm_max[..., None]),
        precision=jax.lax.Precision.HIGHEST,
    )
    z = jnp.log(jnp.maximum(s, 1e-38)) + am_max[:, :, None] + lm_max[:, None, :]

    lp_blank = am[..., blank_id][:, :, None] + lm[..., blank_id][:, None, :] - z
    # label transition at (t, u) emits labels[u]: gather am/lm at the label ids
    k = am.shape[-1]
    lab = jnp.minimum(labels, k - 1)
    am_lab = jnp.take_along_axis(am, lab[:, None, :], axis=-1)  # [B, T, U]
    u = labels.shape[1]
    lm_lab = jnp.take_along_axis(lm[:, :u, :], lab[:, :, None], axis=-1)[..., 0]
    lp_label = am_lab + lm_lab[:, None, :] - z[:, :, :u]
    return lp_blank, lp_label


def rnnt_loss_simple(am, lm, logit_lengths, labels, label_lengths, blank_id):
    """Transducer NLL of the trivial joiner. Value- and gradient-identical
    to ``losses.rnnt_loss`` on ``am[:,:,None,:] + lm[:,None,:,:]`` (tested),
    at O(B*T*U) peak memory instead of O(B*T*U*V).

    Returns: [B] negative log-likelihoods.
    """
    lp_blank, lp_label = simple_transitions(am, lm, labels, blank_id)
    return transducer_nll_from_transitions(
        lp_blank, lp_label, logit_lengths, label_lengths)


def _monotone_band(start, s_range, logit_lengths, label_lengths, u):
    """Project raw window starts onto the feasible set: non-decreasing,
    per-frame step <= s_range - 1, start[0] = 0, terminal cell
    (T_b-1, U_b) covered, and within [0, U+1-s].

    Each projection is a closed-form running reduction (no serial
    adjustment pass): the upper delta bound is
    min_{t'<=t}(start[t'] + (t-t')(s-1)) = cummin(start - t*(s-1)) + t*(s-1),
    and both clamps preserve the previously-established properties (max/min
    of two sequences that each satisfy a one-sided slope bound satisfies it
    too).
    """
    b, t = start.shape
    sm1 = s_range - 1
    ts = jnp.arange(t, dtype=jnp.int32)
    hi = jnp.maximum(u + 1 - s_range, 0)

    start = jnp.clip(start, 0, hi)
    start = start.at[:, 0].set(0)
    start = jax.lax.cummax(start, axis=1)  # non-decreasing
    # per-step increase <= s-1 (keeps consecutive windows overlapping so
    # the blank transition between rows stays representable)
    start = jnp.minimum(
        start, jax.lax.cummin(start - ts[None, :] * sm1, axis=1)
        + ts[None, :] * sm1)
    # terminal coverage: start[T_b-1] >= U_b - s + 1, reached by a ramp of
    # slope s-1 so the delta bound survives the max
    tb = logit_lengths.astype(jnp.int32)
    ub = label_lengths.astype(jnp.int32)
    lb = (ub - sm1)[:, None] - (tb[:, None] - 1 - ts[None, :]) * sm1
    start = jnp.maximum(start, jnp.minimum(lb, hi))
    return jnp.clip(start, 0, hi)


def prune_ranges(am, lm, logit_lengths, labels, label_lengths, blank_id,
                 s_range):
    """Window starts [B, T] for the pruned loss, from the simple lattice.

    One jax.grad through the wavefront DP yields the cell occupancies
    (k2's px_grad/py_grad); each frame's window is placed to maximize the
    occupancy mass it contains, then projected feasible. Integer output;
    gradients do not flow (lax.stop_gradient on the inputs).
    """
    am = jax.lax.stop_gradient(am)
    lm = jax.lax.stop_gradient(lm)
    lp_blank, lp_label = simple_transitions(am, lm, labels, blank_id)

    def total_nll(args):
        b_, l_ = args
        return jnp.sum(transducer_nll_from_transitions(
            b_, l_, logit_lengths, label_lengths))

    gb, gl = jax.grad(total_nll)((lp_blank, lp_label))
    # -d NLL / d lp_blank[t,u] = p(path passes (t,u) emitting blank); same
    # for labels. Their sum per cell is the occupancy.
    occ = -gb + jnp.pad(-gl, ((0, 0), (0, 0), (0, 1)))  # [B, T, U+1]

    b, t, u1 = occ.shape
    s = min(s_range, u1)
    # window mass(j) = sum_{u=j}^{j+s-1} occ[t,u] via cumsum difference
    cum = jnp.cumsum(occ, axis=2)
    cum = jnp.pad(cum, ((0, 0), (0, 0), (1, 0)))  # cum[u] = sum occ[:u]
    n_start = u1 - s + 1
    mass = (jax.lax.dynamic_slice_in_dim(cum, s, n_start, axis=2)
            - cum[:, :, :n_start])  # [B, T, n_start]
    start = jnp.argmax(mass, axis=2).astype(jnp.int32)  # [B, T]
    return _monotone_band(start, s, logit_lengths, label_lengths, u1 - 1)


def _pruned_transitions(joint_params, enc, pred, ranges, labels,
                        label_lengths, cfg, s_range):
    """Full-joint transition log-probs on the pruned band only.

    Returns (lp_blank [B,T,s], lp_label [B,T,s]) where column j of frame t
    is lattice cell (t, ranges[t] + j).
    """
    from ..models.layers import dense
    from ..models.rnnt import _joint_act

    dt = cfg.dtype
    b, t, _ = enc.shape
    u1 = pred.shape[1]
    idx = jnp.clip(
        ranges[:, :, None] + jnp.arange(s_range, dtype=jnp.int32), 0, u1 - 1)

    f = dense(joint_params["enc"], enc, dtype=dt)  # [B, T, J]
    g = dense(joint_params["pred"], pred, dtype=dt)  # [B, U+1, J]
    g_win = jnp.take_along_axis(g[:, None], idx[..., None], axis=2)
    z = _joint_act(f[:, :, None, :] + g_win, cfg)
    logits = dense(joint_params["out"], z, dtype=dt).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)  # [B, T, s, V]

    lp_blank = logp[..., cfg.blank_id]
    k = logp.shape[-1]
    lab_pad = jnp.pad(labels, ((0, 0), (0, 1)))  # label at u (u < U_b)
    lab_win = jnp.minimum(
        jnp.take_along_axis(lab_pad[:, None], idx, axis=2), k - 1)
    lp_label = jnp.take_along_axis(logp, lab_win[..., None], axis=-1)[..., 0]
    # no label transition out of cells at u >= U_b
    valid = idx < label_lengths[:, None, None]
    lp_label = jnp.where(valid, lp_label, _NEG_INF)
    return lp_blank, lp_label


def rnnt_loss_pruned(joint_params, enc, pred, ranges, labels, logit_lengths,
                     label_lengths, cfg, s_range):
    """Transducer NLL over paths inside the pruned band.

    Args:
      joint_params: the REAL joint (models.rnnt.init_joint layout)
      enc: [B, T, E], pred: [B, U+1, H] (predictor_sequence output)
      ranges: [B, T] window starts (prune_ranges output)
      labels/logit_lengths/label_lengths: as in rnnt_loss
      cfg: RNNTConfig; s_range: band width (ranges' window size)

    Returns: [B] NLL. With s_range >= U+1 (band = whole lattice) this is
    exactly losses.rnnt_loss on joint_full (tested); narrower bands give an
    upper bound that tightens as the model aligns. NOTE the band caps label
    emissions at s_range-1 per frame; utterances with U_b > (s_range-1)*T_b
    are unreachable (inf loss), same as k2.
    """
    lp_blank, lp_label = _pruned_transitions(
        joint_params, enc, pred, ranges, labels, label_lengths, cfg, s_range)
    b, t, s = lp_blank.shape
    ranges = jax.lax.stop_gradient(ranges)

    # alpha over window-relative rows: alpha_t[j] = log p(reach (t, r_t+j))
    def row(a_in, lp_label_t):
        # in-row label accumulation, unrolled over the (small) band width
        cols = [a_in[:, 0]]
        for j in range(1, s):
            cols.append(jnp.logaddexp(
                a_in[:, j], cols[-1] + lp_label_t[:, j - 1]))
        return jnp.stack(cols, axis=1)

    js = jnp.arange(s, dtype=jnp.int32)
    alpha0 = row(
        jnp.where(js[None, :] == 0, 0.0, _NEG_INF) * jnp.ones((b, 1)),
        lp_label[:, 0])

    delta = ranges[:, 1:] - ranges[:, :-1]  # [B, T-1], in [0, s-1]

    def step(alpha_prev, xs):
        lpb_prev, lpl_cur, d = xs  # [B,s], [B,s], [B]
        # blank into row t: cell (t, r_t+j) <- (t-1, r_{t-1} + j + d)
        src = js[None, :] + d[:, None]
        ok = src < s
        src = jnp.minimum(src, s - 1)
        a_in = jnp.where(
            ok,
            jnp.take_along_axis(alpha_prev + lpb_prev, src, axis=1),
            _NEG_INF)
        alpha = row(a_in, lpl_cur)
        return alpha, alpha

    xs = (jnp.moveaxis(lp_blank[:, :-1], 1, 0),
          jnp.moveaxis(lp_label[:, 1:], 1, 0),
          jnp.moveaxis(delta, 1, 0))
    _, alphas = jax.lax.scan(step, alpha0, xs)  # [T-1, B, s]
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)  # [T, B, s]

    tb = jnp.clip(logit_lengths.astype(jnp.int32) - 1, 0, t - 1)
    bi = jnp.arange(b)
    j_fin = jnp.clip(
        label_lengths.astype(jnp.int32) - ranges[bi, tb], 0, s - 1)
    alpha_fin = alphas[tb, bi, j_fin]
    blank_fin = lp_blank[bi, tb, j_fin]
    return -(alpha_fin + blank_fin)


def pruned_loss_bundle(simple_params, joint_params, enc, pred, labels,
                       logit_lengths, label_lengths, cfg, s_range=5,
                       simple_scale=0.5, pruned_scale=1.0):
    """The icefall training objective: simple loss (alignment teacher) +
    pruned full-joint loss on the bands it selects.

    Returns (loss [B], aux dict with the two parts).
    """
    from ..models.layers import dense

    am = dense(simple_params["am"], enc.astype(jnp.float32))
    lm = dense(simple_params["lm"], pred.astype(jnp.float32))
    simple = rnnt_loss_simple(
        am, lm, logit_lengths, labels, label_lengths, cfg.blank_id)
    ranges = prune_ranges(
        am, lm, logit_lengths, labels, label_lengths, cfg.blank_id, s_range)
    s_eff = min(s_range, pred.shape[1])
    pruned = rnnt_loss_pruned(
        joint_params, enc, pred, ranges, labels, logit_lengths,
        label_lengths, cfg, s_eff)
    loss = simple_scale * simple + pruned_scale * pruned
    return loss, {"simple": simple, "pruned": pruned, "ranges": ranges}
