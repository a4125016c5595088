"""Transducer (RNN-T) and CTC losses in JAX.

The reference is inference-only (SURVEY.md: no trainer in-repo), but the TPU
build ships training so the models are a complete product: the RNN-T loss
powers the flagship train step (and the driver's multi-chip dryrun), and the
CTC loss backs the espnet-flavor models and forced alignment.

The RNN-T forward variable is computed as an anti-diagonal wavefront scan:
diagonal d holds every lattice cell (t, u) with t + u = d, so the whole
T×U trellis completes in T+U-1 sequential steps with each step fully
vectorized over the diagonal (and the batch) — the standard way to keep a
2-D DP on the TPU's vector units instead of a scalar loop.
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["rnnt_loss", "ctc_loss", "transducer_nll_from_transitions"]

_NEG_INF = -1e30


def rnnt_loss(logits, logit_lengths, labels, label_lengths, blank_id):
    """Transducer negative log-likelihood.

    Args:
      logits: [B, T, U+1, K] joint outputs (unnormalized)
      logit_lengths: [B] valid encoder frames per element
      labels: [B, U] int32 label sequences (padded arbitrarily)
      label_lengths: [B] valid label counts
      blank_id: index of the blank logit

    Returns:
      [B] negative log-likelihoods.
    """
    b, t, u1, k = logits.shape
    u = u1 - 1
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # blank[b,t,v] = logp of blank at (t, u=v); label[b,t,v] = logp of the
    # v-th reference label at (t, v).
    lp_blank = logp[..., blank_id]  # [B, T, U+1]
    lab = jnp.minimum(labels, k - 1)  # safe gather
    lp_label = jnp.take_along_axis(
        logp[:, :, :u, :], lab[:, None, :, None], axis=-1
    )[..., 0]  # [B, T, U]
    return transducer_nll_from_transitions(
        lp_blank, lp_label, logit_lengths, label_lengths)


def transducer_nll_from_transitions(
        lp_blank, lp_label, logit_lengths, label_lengths):
    """Transducer NLL from per-cell transition log-probs — the lattice DP
    shared by rnnt_loss (full joint) and pruned_rnnt.rnnt_loss_simple
    (trivial joiner, which never materializes a [B,T,U,K] joint).

    Args:
      lp_blank: [B, T, U+1] log p(blank | t, u)
      lp_label: [B, T, U] log p(y_{u+1} | t, u)
    Returns: [B] negative log-likelihoods.
    """
    b, t, u1 = lp_blank.shape
    u = u1 - 1

    # alpha over anti-diagonals: diag[d][u] = alpha[t=d-u, u]
    def step(diag_prev, d):
        u_idx = jnp.arange(u1)  # [U+1]
        t_idx = d - u_idx
        valid = (t_idx >= 0) & (t_idx < t)

        # from (t-1, u): blank transition
        t_im1 = jnp.clip(t_idx - 1, 0, t - 1)
        blank_in = diag_prev + lp_blank[
            jnp.arange(b)[:, None], t_im1[None, :], u_idx[None, :]
        ]
        blank_in = jnp.where((t_idx > 0)[None, :], blank_in, _NEG_INF)

        # from (t, u-1): label transition
        prev_u = jnp.roll(diag_prev, 1, axis=1)  # diag_prev[u-1] at slot u
        t_cur = jnp.clip(t_idx, 0, t - 1)
        u_im1 = jnp.clip(u_idx - 1, 0, max(u - 1, 0))
        if u > 0:
            lab_term = lp_label[
                jnp.arange(b)[:, None], t_cur[None, :], u_im1[None, :]
            ]
        else:
            lab_term = jnp.full((b, u1), _NEG_INF)
        label_in = prev_u + lab_term
        label_in = jnp.where((u_idx > 0)[None, :], label_in, _NEG_INF)

        diag = jnp.logaddexp(blank_in, label_in)
        diag = jnp.where(valid[None, :], diag, _NEG_INF)
        return diag, None

    diag0 = jnp.full((b, u1), _NEG_INF).at[:, 0].set(0.0)  # alpha[0,0] = 0
    # run diagonals d = 1 .. T+U-1; track alpha at the final cell of each
    # element by reconstructing from the last diagonal it appears in. Easier:
    # keep the full alpha for the needed terminal cells via scan collection.
    def scan_body(carry, d):
        diag = step(carry, d)[0]
        return diag, diag

    ds = jnp.arange(1, t + u1 - 1 + 1)
    _, diags = jax.lax.scan(scan_body, diag0, ds)  # [T+U, B, U+1]
    diags = jnp.concatenate([diag0[None], diags], axis=0)  # [T+U+1, B, U+1]

    # terminal: alpha[T_b - 1, U_b] + log blank(T_b - 1, U_b)
    tb = logit_lengths.astype(jnp.int32)
    ub = label_lengths.astype(jnp.int32)
    d_final = tb - 1 + ub
    alpha_final = diags[d_final, jnp.arange(b), ub]
    blank_final = lp_blank[jnp.arange(b), jnp.clip(tb - 1, 0, t - 1), ub]
    return -(alpha_final + blank_final)


def ctc_loss(logits, logit_lengths, labels, label_lengths, blank_id):
    """CTC negative log-likelihood (wraps optax's TPU-friendly implementation).

    Args:
      logits: [B, T, K]
      logit_lengths: [B], labels: [B, N], label_lengths: [B]
    """
    import optax

    b, t, _ = logits.shape
    n = labels.shape[1]
    logit_paddings = (
        jnp.arange(t)[None, :] >= logit_lengths[:, None]
    ).astype(jnp.float32)
    label_paddings = (
        jnp.arange(n)[None, :] >= label_lengths[:, None]
    ).astype(jnp.float32)
    return optax.ctc_loss(
        logits.astype(jnp.float32),
        logit_paddings,
        labels,
        label_paddings,
        blank_id=blank_id,
    )
