"""Fused log-softmax + blank split + top-m for transducer beam search.

Beam decoders (decoding/rnnt_beam.py — NeMo ALSD; decoding/transducer_graves.py
— ESPnet) need, per step, the blank log-probability and the top-m *label*
log-probabilities of each hypothesis's joint logits. The XLA formulation
(`log_softmax` → `.at[blank].set(-inf)` → `lax.top_k`) costs 4+ full HBM
round-trips of the [R, V] tensor per step — and `top_k` over a vocab axis
lowers to a full sort on TPU. Profiled at serving shape ([576, 3025] inside
the ALSD `while_loop`) that chain is ~4 ms of the 4.5 ms step.

This kernel reads the logits tile into VMEM ONCE and does everything there:
the log-sum-exp, the blank column split, and m iterated masked argmaxes
(exact top-m; ties resolve to the lowest index, same order as
``jax.lax.top_k``). HBM traffic drops to the single [R, V] read plus three
tiny outputs.

Inference-only (no VJP): beam search never differentiates through decode.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["topm_logsoftmax", "topm_logsoftmax_xla",
           "joint_topm", "joint_topm_xla"]

_NEG = -1.0e30  # plain float: a jnp scalar would be captured as a constant
#                 (and leak as an escaped tracer across jit traces)


def _topm_body(x, lpb_ref, val_ref, idx_ref, *, m, blank, v):
    """Log-softmax + blank split + m masked argmaxes over fp32 logits x."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    x = jnp.where(col < v, x, _NEG)  # lane-pad columns never participate

    xm = jnp.max(x, axis=-1, keepdims=True)
    lse = xm + jnp.log(jnp.sum(jnp.exp(x - xm), axis=-1, keepdims=True))
    lpb_ref[...] = x[:, blank : blank + 1] - lse

    # exact top-m by m masked argmaxes, entirely in VMEM
    x = jnp.where(col == blank, _NEG, x)
    vals, idxs = [], []
    big = jnp.int32(x.shape[-1])
    for _ in range(m):
        vmax = jnp.max(x, axis=-1, keepdims=True)  # [br, 1]
        am = jnp.min(
            jnp.where(x == vmax, col, big), axis=-1, keepdims=True
        )  # lowest index among ties — lax.top_k's order
        vals.append(vmax)
        idxs.append(am)
        x = jnp.where(col == am, _NEG, x)
    val_ref[...] = jnp.concatenate(vals, axis=-1) - lse
    idx_ref[...] = jnp.concatenate(idxs, axis=-1)


def _kernel(x_ref, lpb_ref, val_ref, idx_ref, *, m, blank, v):
    _topm_body(x_ref[...].astype(jnp.float32), lpb_ref, val_ref, idx_ref,
               m=m, blank=blank, v=v)


@functools.partial(
    jax.jit, static_argnames=("m", "blank", "block_r", "interpret")
)
def topm_logsoftmax(logits, m, blank, *, block_r=256, interpret=False):
    """Blank log-prob and exact top-m label log-probs of each row.

    Args:
      logits: [R, V] raw joint logits (any float dtype; compute is fp32)
      m: number of label expansions (static)
      blank: blank token id (static)

    Returns:
      (lp_blank [R] fp32, top_lp [R, m] fp32, top_tok [R, m] int32) —
      identical values/order to ``topm_logsoftmax_xla`` (the XLA reference
      used by the parity tests), up to fp32 reduction association.
    """
    r, v = logits.shape
    br = min(block_r, r)
    grid = (-(-r // br),)
    lpb, vals, idxs = pl.pallas_call(
        functools.partial(_kernel, m=m, blank=blank, v=v),
        out_shape=(
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
            jax.ShapeDtypeStruct((r, m), jnp.float32),
            jax.ShapeDtypeStruct((r, m), jnp.int32),
        ),
        grid=grid,
        in_specs=[pl.BlockSpec((br, v), lambda i: (i, 0))],
        out_specs=(
            pl.BlockSpec((br, 1), lambda i: (i, 0)),
            pl.BlockSpec((br, m), lambda i: (i, 0)),
            pl.BlockSpec((br, m), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(logits)
    return lpb[:, 0], vals, idxs


def topm_logsoftmax_xla(logits, m, blank):
    """XLA reference formulation (the pre-kernel decode chain)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lp_blank = logp[..., blank]
    label_logp = logp.at[..., blank].set(_NEG)
    top_lp, top_tok = jax.lax.top_k(label_logp, m)
    return lp_blank, top_lp, top_tok.astype(jnp.int32)


# ---------------------------------------------------------------------------
# fused joint + top-m: the whole per-step tail of the beam loop in one op
# ---------------------------------------------------------------------------


def _joint_kernel(enc_ref, dec_ref, wp_ref, bp_ref, wo_ref, bo_ref,
                  lpb_ref, val_ref, idx_ref, *, m, blank, v, act, cdt):
    cdt = jnp.dtype(cdt)
    f32 = jnp.float32
    # same dtype chain as models/rnnt.py:joint_step_from_enc_proj —
    # enc.astype(bf16) + (bf16 matmul + bf16 bias), activation in bf16,
    # output matmul bf16 + bias, cast fp32 for the log-softmax
    z = enc_ref[...].astype(cdt) + (
        jax.lax.dot_general(
            dec_ref[...].astype(cdt), wp_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        ).astype(cdt)
        + bp_ref[...]
    )
    if act == "relu":
        z = jnp.maximum(z, 0)
    elif act == "tanh":
        z = jnp.tanh(z)
    elif act == "sigmoid":
        z = jax.nn.sigmoid(z)
    else:  # pragma: no cover - validated by the wrapper
        raise ValueError(act)
    logits = (
        jax.lax.dot_general(
            z, wo_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        ).astype(cdt)
        + bo_ref[...]
    ).astype(f32)
    _topm_body(logits, lpb_ref, val_ref, idx_ref, m=m, blank=blank, v=v)


@functools.partial(
    jax.jit,
    static_argnames=("m", "blank", "activation", "compute_dtype", "block_r",
                     "interpret"),
)
def joint_topm(
    w_pred, b_pred, w_out, b_out, enc_proj_row, dec_out, m, blank, *,
    activation="relu", compute_dtype="bfloat16", block_r=128,
    interpret=False,
):
    """Joint pred-projection + activation + output projection + log-softmax
    + blank split + exact top-m, in ONE VMEM pass.

    Replaces the per-step chain ``joint_step_from_enc_proj`` →
    ``topm_logsoftmax`` (~6 serial ops with 3 HBM round-trips of [R, V])
    inside the beam while_loops. Weights should be passed PRE-CAST to the
    compute dtype so the cast hoists out of the loop.

    Args:
      w_pred: [H, J]; b_pred: [J]; w_out: [J, V]; b_out: [V]
      enc_proj_row: [R, J] fp32 — encoder side of the joint, precomputed
        (models/rnnt.py:joint_precompute_enc), gathered at the frame index
      dec_out: [R, H] fp32 prediction-network output
      m, blank: static top-m count and blank id

    Returns:
      (lp_blank [R] fp32, top_lp [R, m] fp32, top_tok [R, m] int32) —
      same contract as ``topm_logsoftmax``.
    """
    r, j = enc_proj_row.shape
    h = dec_out.shape[-1]
    v = w_out.shape[-1]
    cdt = jnp.dtype(compute_dtype)
    w_pred = w_pred.astype(cdt)
    b_pred = b_pred.astype(cdt).reshape(1, -1)
    w_out = w_out.astype(cdt)
    b_out = b_out.astype(cdt).reshape(1, -1)
    br = min(block_r, r)
    grid = (-(-r // br),)
    lpb, vals, idxs = pl.pallas_call(
        functools.partial(
            _joint_kernel, m=m, blank=blank, v=v, act=activation,
            cdt=compute_dtype,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
            jax.ShapeDtypeStruct((r, m), jnp.float32),
            jax.ShapeDtypeStruct((r, m), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, j), lambda i: (i, 0)),
            pl.BlockSpec((br, h), lambda i: (i, 0)),
            pl.BlockSpec((h, j), lambda i: (0, 0)),
            pl.BlockSpec((1, j), lambda i: (0, 0)),
            pl.BlockSpec((j, v), lambda i: (0, 0)),
            pl.BlockSpec((1, v), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((br, 1), lambda i: (i, 0)),
            pl.BlockSpec((br, m), lambda i: (i, 0)),
            pl.BlockSpec((br, m), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(enc_proj_row, dec_out, w_pred, b_pred, w_out, b_out)
    return lpb[:, 0], vals, idxs


def joint_topm_xla(w_pred, b_pred, w_out, b_out, enc_proj_row, dec_out,
                   m, blank, *, activation="relu",
                   compute_dtype="bfloat16"):
    """XLA reference formulation of the fused joint + top-m."""
    cdt = jnp.dtype(compute_dtype)
    z = enc_proj_row.astype(cdt) + (
        dec_out.astype(cdt) @ w_pred.astype(cdt) + b_pred.astype(cdt)
    )
    if activation == "relu":
        z = jax.nn.relu(z)
    elif activation == "tanh":
        z = jnp.tanh(z)
    elif activation == "sigmoid":
        z = jax.nn.sigmoid(z)
    else:
        raise ValueError(activation)
    logits = (z @ w_out.astype(cdt) + b_out.astype(cdt)).astype(jnp.float32)
    return topm_logsoftmax_xla(logits, m, blank)
