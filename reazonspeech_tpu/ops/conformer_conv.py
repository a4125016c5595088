"""Pallas TPU kernel: fused Conformer convolution module (forward).

The conv module — pointwise(D→2D) → GLU → depthwise(K) → batch-norm →
swish → pointwise(D→D) — is bandwidth-bound on the XLA path: the [B, T, 2D]
GLU input and two [B, T, D] intermediates round-trip HBM every layer. This
kernel keeps one utterance's whole time axis resident in VMEM per grid step
(serving chunks are ≤512 encoder frames) and runs the chain end-to-end:
HBM traffic drops to read x + write y, the two matmuls hit the MXU in bf16
with fp32 accumulation, and the depthwise conv is K vector multiply-adds
over rolled copies (no gather).

Batch-norm statistics are pre-folded into a scale/bias pair host-side.
Padding semantics match models/fastconformer._conv_module: frames at or
beyond the valid length are zeroed before the depthwise conv, so padding
never leaks into valid frames; rows rolled across the block edge are
masked the same way (equivalent to SAME zero padding).

Parity gated in tests/test_conformer_conv.py (interpret mode) and
tools/tpu_validate_kernel.py (real chip).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_conv_module", "fold_batch_norm"]


def fold_batch_norm(p, eps=1e-5):
    """{scale, bias, mean, var} -> (scale', bias') with the statistics folded:
    y = x*scale' + bias' == (x - mean)/sqrt(var+eps)*scale + bias."""
    inv = p["scale"] / jnp.sqrt(p["var"] + eps)
    return inv.astype(jnp.float32), (p["bias"] - p["mean"] * inv).astype(jnp.float32)


def _kernel(lens_ref, x_ref, ln_g_ref, ln_b_ref, w_in_ref, b_in_ref, dw_ref,
            b_dw_ref, scale_ref, bias_ref, w_out_ref, b_out_ref, out_ref, *,
            t, d, k, norm, in_ln, cdt):
    x = x_ref[0]  # [T, D] compute dtype (or residual dtype when in_ln)
    if in_ln:
        # pre-module LayerNorm fused in: read the raw fp32 residual tile,
        # normalize in VMEM, cast to the compute dtype — the LN output never
        # touches HBM (same contract as ops/ln_dense.py)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        cent = x32 - mean
        var = jnp.mean(jnp.square(cent), axis=-1, keepdims=True)
        x32 = cent * jax.lax.rsqrt(var + 1e-5)
        x = (x32 * ln_g_ref[:] + ln_b_ref[:]).astype(cdt)

    h2 = jnp.dot(x, w_in_ref[:], preferred_element_type=jnp.float32)
    h2 = h2 + b_in_ref[:].astype(jnp.float32)
    a, g = h2[:, :d], h2[:, d:]
    h = a * jax.nn.sigmoid(g)  # GLU, fp32 [T, D]

    # zero padded frames so the depthwise conv sees SAME zero padding.
    # h stays fp32 through the rolls: Mosaic's rotate only handles 32-bit
    # lanes ("Rotate with non-32-bit data"), and the multiply-adds accumulate
    # in fp32 anyway.
    valid = lens_ref[pl.program_id(0)]
    row = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    h = jnp.where(row < valid, h, 0.0)

    # depthwise conv: y[i] = sum_j h[i + j - K//2] * dw[j]
    acc = jnp.zeros((t, d), jnp.float32)
    half = k // 2
    for j in range(k):
        off = j - half
        shifted = pltpu.roll(h, (t - off) % t, 0) if off != 0 else h
        # rows whose source index fell outside [0, T) wrapped around: zero them
        if off > 0:
            shifted = jnp.where(row < t - off, shifted, 0)
        elif off < 0:
            shifted = jnp.where(row >= -off, shifted, 0)
        acc = acc + shifted * dw_ref[j, :].astype(jnp.float32)
    acc = acc + b_dw_ref[:].astype(jnp.float32)

    # norm + swish (fp32). "folded": batch-norm statistics pre-folded into
    # scale/bias; "layer": per-frame LayerNorm over channels (espnet recipes)
    if norm == "layer":
        mean = jnp.mean(acc, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(acc - mean), axis=-1, keepdims=True)
        acc = (acc - mean) * jax.lax.rsqrt(var + 1e-5)
    y = acc * scale_ref[:] + bias_ref[:]
    y = y * jax.nn.sigmoid(y)

    out = jnp.dot(y.astype(x.dtype), w_out_ref[:], preferred_element_type=jnp.float32)
    out = out + b_out_ref[:].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("norm", "compute_dtype",
                                              "interpret"))
def fused_conv_module(x, lengths, w_in, b_in, dw, b_dw, bn_scale, bn_bias,
                      w_out, b_out, norm="folded", ln_scale=None,
                      ln_bias=None, compute_dtype=None, interpret=False):
    """Fused Conformer conv module.

    Args:
      x: [B, T, D] layer-normed input (compute dtype, bf16 on TPU) — or the
        RAW residual stream (fp32) when ``ln_scale``/``ln_bias`` are given,
        in which case the pre-module LayerNorm runs inside the kernel
      lengths: [B] int32 valid frame counts
      w_in: [D, 2D], b_in: [2D]  (pointwise expansion; GLU halves it)
      dw: [K, D], b_dw: [D]      (depthwise kernel taps)
      bn_scale, bn_bias: [D] fp32 folded batch-norm (fold_batch_norm)
      w_out: [D, D], b_out: [D]
      ln_scale, ln_bias: [D] pre-module LayerNorm affine params, or None
      compute_dtype: matmul dtype when in-kernel LN is used (default x.dtype)

    Returns: [B, T, D] in the compute dtype.
    """
    b, t, d = x.shape
    k = dw.shape[0]
    in_ln = ln_scale is not None
    dt = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype
    if ln_scale is None:
        ln_scale = jnp.ones((d,))
        ln_bias = jnp.zeros((d,))
    w_in = w_in.astype(dt)
    dw = dw.reshape(k, d).astype(jnp.float32)  # [K, 1, D] (conv layout) or [K, D]
    w_out = w_out.astype(dt)

    out = pl.pallas_call(
        functools.partial(_kernel, t=t, d=d, k=k, norm=norm, in_ln=in_ln,
                          cdt=dt),
        out_shape=jax.ShapeDtypeStruct((b, t, d), dt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, t, d), lambda g, lens: (g, 0, 0)),
                pl.BlockSpec((d,), lambda g, lens: (0,)),
                pl.BlockSpec((d,), lambda g, lens: (0,)),
                pl.BlockSpec((d, 2 * d), lambda g, lens: (0, 0)),
                pl.BlockSpec((2 * d,), lambda g, lens: (0,)),
                pl.BlockSpec((k, d), lambda g, lens: (0, 0)),
                pl.BlockSpec((d,), lambda g, lens: (0,)),
                pl.BlockSpec((d,), lambda g, lens: (0,)),
                pl.BlockSpec((d,), lambda g, lens: (0,)),
                pl.BlockSpec((d, d), lambda g, lens: (0, 0)),
                pl.BlockSpec((d,), lambda g, lens: (0,)),
            ],
            out_specs=pl.BlockSpec((1, t, d), lambda g, lens: (g, 0, 0)),
        ),
        interpret=interpret,
    )(
        lengths.astype(jnp.int32),
        x, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
        w_in, b_in.astype(jnp.float32), dw, b_dw.astype(jnp.float32),
        bn_scale.astype(jnp.float32), bn_bias.astype(jnp.float32),
        w_out, b_out.astype(jnp.float32),
    )
    return out
