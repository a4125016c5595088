"""Fused LSTM decode step for the transducer prediction network.

The beam decoders (decoding/rnnt_beam.py — NeMo ALSD; decoding/
transducer_graves.py — ESPnet default_beam_search) advance an LSTM
prediction network by ONE token inside a ``lax.while_loop``. The XLA
formulation of one cell (models/rnnt.py:_lstm_cell) is ~10 separate ops —
two gate matmuls, the gate split, three sigmoids, two tanhs and the state
arithmetic — and profiling shows both beam loops are op-count-bound (each
small fused op costs ~8-15 us of fixed launch/startup on TPU, far above its
arithmetic time at decode row counts). This kernel runs the whole cell in
one VMEM pass: both [R,H]x[H,4H] gate matmuls on the MXU and every
elementwise in registers, so one op replaces the ten.

Numerics mirror the XLA path exactly in structure: gates are computed in the
compute dtype (bf16 matmuls with fp32 MXU accumulation, rounded per-dot like
XLA's dot lowering), summed with the bias in compute dtype, then cast to
fp32 for the state arithmetic — the same dtype chain as
models/rnnt.py:_lstm_cell (behavioral parity: the prediction network the
reference reaches through NeMo ``EncDecRNNTBPEModel`` / espnet2
``TransducerDecoder``; pkg/nemo-asr/src/transcribe.py:48-53,
pkg/espnet-asr/src/transcribe.py:27-32).

Inference-only (no VJP): decode never differentiates; training uses the XLA
cell inside ``predictor_sequence``.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["lstm_cell_step", "lstm_cell_step_xla"]


def _kernel(x_ref, h_ref, c_ref, wih_ref, whh_ref, b_ref,
            hout_ref, cout_ref, *, hidden, cdt):
    cdt = jnp.dtype(cdt)
    f32 = jnp.float32
    x = x_ref[...].astype(cdt)
    h = h_ref[...].astype(cdt)
    gates = (
        jax.lax.dot_general(
            x, wih_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        ).astype(cdt)
        + jax.lax.dot_general(
            h, whh_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        ).astype(cdt)
        + b_ref[...]
    ).astype(f32)
    i = gates[:, 0 * hidden : 1 * hidden]
    f = gates[:, 1 * hidden : 2 * hidden]
    g = gates[:, 2 * hidden : 3 * hidden]
    o = gates[:, 3 * hidden : 4 * hidden]
    c_new = jax.nn.sigmoid(f) * c_ref[...].astype(f32) + jax.nn.sigmoid(
        i
    ) * jnp.tanh(g)
    hout_ref[...] = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    cout_ref[...] = c_new


@functools.partial(
    jax.jit, static_argnames=("compute_dtype", "block_r", "interpret")
)
def lstm_cell_step(
    w_ih, w_hh, bias, x, h, c, *,
    compute_dtype="bfloat16", block_r=128, interpret=False,
):
    """One LSTM cell step, fused.

    Args:
      w_ih: [H_in, 4H] gate input weights — pass PRE-CAST to the compute
        dtype so the cast hoists out of the decode loop (fp32 also works,
        the kernel casts, at 2x the weight HBM read).
      w_hh: [H, 4H]; bias: [4H] (b_ih + b_hh precombined)
      x: [R, H_in] input (embedding output); h, c: [R, H] previous state

    Returns:
      (h_new [R, H] fp32, c_new [R, H] fp32) — h_new is also the cell's
      output (the prediction-network ``g`` fed to the joint).
    """
    r, h_in = x.shape
    hidden = h.shape[-1]
    cdt = jnp.dtype(compute_dtype)
    w_ih = w_ih.astype(cdt)
    w_hh = w_hh.astype(cdt)
    bias = bias.astype(cdt).reshape(1, -1)
    br = min(block_r, r)
    grid = (-(-r // br),)
    h_new, c_new = pl.pallas_call(
        functools.partial(_kernel, hidden=hidden, cdt=compute_dtype),
        out_shape=(
            jax.ShapeDtypeStruct((r, hidden), jnp.float32),
            jax.ShapeDtypeStruct((r, hidden), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, h_in), lambda i: (i, 0)),
            pl.BlockSpec((br, hidden), lambda i: (i, 0)),
            pl.BlockSpec((br, hidden), lambda i: (i, 0)),
            pl.BlockSpec((h_in, 4 * hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden, 4 * hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, 4 * hidden), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((br, hidden), lambda i: (i, 0)),
            pl.BlockSpec((br, hidden), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(x, h, c, w_ih, w_hh, bias)
    return h_new, c_new


def lstm_cell_step_xla(w_ih, w_hh, bias, x, h, c, *, compute_dtype="bfloat16"):
    """XLA reference formulation (models/rnnt.py:_lstm_cell with the bias
    sum hoisted)."""
    cdt = jnp.dtype(compute_dtype)
    xb = x.astype(cdt)
    gates = (
        xb @ w_ih.astype(cdt)
        + h.astype(cdt) @ w_hh.astype(cdt)
        + bias.astype(cdt)
    ).astype(jnp.float32)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new
