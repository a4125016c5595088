"""Pallas TPU kernel: LayerNorm fused into the following dense projection.

Every Conformer sub-block starts with ``dense(layer_norm(x))`` (the pre-norm
arrangement NeMo/ESPnet use — pkg/nemo-asr via NeMo's ConformerLayer, see
models/fastconformer.py). On the XLA path the LayerNorm output round-trips
HBM in fp32 between the reduce fusion and the matmul: at the 619M serving
shape that is ~190 MB written + read per LN site, four sites per layer.

This kernel reads a [BT, D] tile of the raw residual stream (fp32), computes
the LayerNorm statistics in VMEM, casts the normalized rows to the compute
dtype and immediately multiplies with the weight block — the normalized
tensor never exists in HBM. The weight matrix has a constant BlockSpec index,
so Pallas keeps it VMEM-resident across all (batch, time) grid steps.

The optional ``t_out`` pads the TIME axis of the output with zero rows
(128-alignment for the attention kernel downstream) at no extra cost — the
store is masked, replacing the explicit jnp.pad copies the attention wrapper
would otherwise pay per layer.

Numerics match ``dense(layer_norm(x), dtype)``: fp32 statistics, the cast to
the compute dtype happens at the same point as the XLA path, matmul
accumulates fp32. Parity gated in tests/test_ln_dense.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ln_dense", "ln_dense_diff", "ln_dense_supported", "add_ln",
           "add_ln_diff", "ln_dense_add", "ln_dense_add_diff"]

_VMEM_W_BYTES = 10 * 2**20  # weight residency budget


def ln_dense_supported(d, n, dtype_bytes=2):
    """Shapes the kernel serves: lane-aligned dims and a VMEM-resident W."""
    return d % 128 == 0 and n % 128 == 0 and d * n * dtype_bytes <= _VMEM_W_BYTES


def _kernel(x_ref, g_ref, b_ref, *rest, t, bt, eps, act, nseg):
    # rest = w_0..w_{nseg-1}, c_0..c_{nseg-1}, out_ref. Multiple weight
    # segments (the packed qkv projection) share one LN pass and write to
    # lane slices of the same output — no concatenated weight copy in HBM.
    w_refs = rest[:nseg]
    c_refs = rest[nseg:2 * nseg]
    out_ref = rest[2 * nseg]
    x = x_ref[0].astype(jnp.float32)  # [BT, D]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    cent = x - mean
    var = jnp.mean(jnp.square(cent), axis=-1, keepdims=True)
    xn = cent * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[0] + b_ref[0]
    xnc = xn.astype(w_refs[0].dtype)
    # zero rows past the true sequence end (t_out padding; also covers the
    # partial tail block whose x rows were out-of-bounds garbage)
    row = jax.lax.broadcasted_iota(jnp.int32, (xn.shape[0], 1), 0) \
        + pl.program_id(1) * bt
    off = 0
    for w_ref, c_ref in zip(w_refs, c_refs):
        y = jnp.dot(xnc, w_ref[:], preferred_element_type=jnp.float32)
        y = y + c_ref[0]
        if act == "swish":
            y = y * jax.nn.sigmoid(y)
        y = jnp.where(row < t, y, 0.0)
        ni = y.shape[1]
        out_ref[0, :, off:off + ni] = y.astype(out_ref.dtype)
        off += ni


@functools.partial(jax.jit, static_argnames=("activation", "t_out", "eps",
                                              "block_t", "interpret"))
def ln_dense(x, ln_scale, ln_bias, w, c=None, *, activation=None, t_out=None,
             eps=1e-5, block_t=None, interpret=False):
    """dense(layer_norm(x)) with the normalized tensor kept in VMEM.

    Args:
      x: [B, T, D] residual stream (any float dtype; stats in fp32)
      ln_scale, ln_bias: [D] LayerNorm affine params
      w: [D, N] projection weights (cast to the compute dtype by the
        caller) — or a tuple of [D, Ni] segments that share the LN pass and
        pack along the output's lane axis (the qkv projection; no
        concatenated weight copy ever exists in HBM)
      c: [N] projection bias, a matching tuple, or None
      activation: None | "swish" (fused epilogue)
      t_out: output time size ≥ T; rows T..t_out are zeros (128-aligned
        output for the fused attention kernel, replacing explicit pads)

    Returns: [B, t_out or T, sum(Ni)] in w.dtype.
    """
    ws = w if isinstance(w, (tuple, list)) else (w,)
    cs = c if isinstance(c, (tuple, list)) else (c,) * len(ws)
    b, t, d = x.shape
    ns = [wi.shape[1] for wi in ws]
    n = sum(ns)
    to = t if t_out is None else t_out
    # t_out must be the 128-aligned pad of t so the (possibly partial) tail
    # block always overlaps x's valid rows — a fully out-of-bounds input
    # block would be undefined
    assert to >= t and (t_out is None or (to % 128 == 0 and to - t < 128))
    if block_t is None:
        # largest divisor block: fewer, fatter grid steps (bt=192 at the
        # serving t_out=384 measures ~2x faster than 128 for the
        # multi-segment qkv call)
        block_t = next((bt for bt in (256, 192, 128) if to % bt == 0), 128)
    bt = min(block_t, to)
    cs = tuple(jnp.zeros((ni,), jnp.float32) if ci is None else ci
               for ni, ci in zip(ns, cs))

    grid = (b, -(-to // bt))  # partial tail block: masked by the row guard
    out = pl.pallas_call(
        functools.partial(_kernel, t=t, bt=bt, eps=eps, act=activation,
                          nseg=len(ws)),
        out_shape=jax.ShapeDtypeStruct((b, to, n), ws[0].dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bt, d), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, d), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, d), lambda bi, ti: (0, 0)),
        ] + [pl.BlockSpec((d, ni), lambda bi, ti: (0, 0)) for ni in ns]
          + [pl.BlockSpec((1, ni), lambda bi, ti: (0, 0)) for ni in ns],
        out_specs=pl.BlockSpec((1, bt, n), lambda bi, ti: (bi, ti, 0)),
        interpret=interpret,
    )(
        x,
        ln_scale.astype(jnp.float32).reshape(1, d),
        ln_bias.astype(jnp.float32).reshape(1, d),
        *ws,
        *(ci.astype(jnp.float32).reshape(1, -1) for ci in cs),
    )
    return out


def _xla_reference(x, ln_scale, ln_bias, w, c, activation, t_out, eps=1e-5):
    """The formulation the kernel replaces (and its backward for the VJP)."""
    ws = w if isinstance(w, (tuple, list)) else (w,)
    cs = c if isinstance(c, (tuple, list)) else (c,) * len(ws)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    xn = (x32 - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * ln_scale + ln_bias
    outs = []
    for wi, ci in zip(ws, cs):
        y = jnp.dot(xn.astype(wi.dtype), wi, preferred_element_type=jnp.float32)
        if ci is not None:
            y = y + ci
        if activation == "swish":
            y = y * jax.nn.sigmoid(y)
        outs.append(y)
    y = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    y = y.astype(ws[0].dtype)
    if t_out is not None and t_out != x.shape[1]:
        y = jnp.pad(y, ((0, 0), (0, t_out - x.shape[1]), (0, 0)))
    return y


def _kernel_add(r_ref, dlt_ref, g_ref, b_ref, *rest, t, bt, eps, act, nseg,
                scale):
    """ln_dense with the residual add fused in: x = r + scale·delta is
    computed in VMEM, written out as the new stream, normalized and
    projected — the separate XLA add pass over the fp32 stream disappears."""
    w_refs = rest[:nseg]
    c_refs = rest[nseg:2 * nseg]
    out_ref = rest[2 * nseg]
    rout_ref = rest[2 * nseg + 1]
    xr = r_ref[0].astype(jnp.float32) + scale * dlt_ref[0].astype(jnp.float32)
    rout_ref[0] = xr.astype(rout_ref.dtype)
    mean = jnp.mean(xr, axis=-1, keepdims=True)
    cent = xr - mean
    var = jnp.mean(jnp.square(cent), axis=-1, keepdims=True)
    xn = cent * jax.lax.rsqrt(var + eps)
    xn = xn * g_ref[0] + b_ref[0]
    xnc = xn.astype(w_refs[0].dtype)
    row = jax.lax.broadcasted_iota(jnp.int32, (xn.shape[0], 1), 0) \
        + pl.program_id(1) * bt
    off = 0
    for w_ref, c_ref in zip(w_refs, c_refs):
        y = jnp.dot(xnc, w_ref[:], preferred_element_type=jnp.float32)
        y = y + c_ref[0]
        if act == "swish":
            y = y * jax.nn.sigmoid(y)
        y = jnp.where(row < t, y, 0.0)
        ni = y.shape[1]
        out_ref[0, :, off:off + ni] = y.astype(out_ref.dtype)
        off += ni


@functools.partial(jax.jit, static_argnames=("scale", "activation", "t_out",
                                              "eps", "block_t", "interpret"))
def ln_dense_add(r, delta, ln_scale, ln_bias, w, c=None, *, scale=1.0,
                 activation=None, t_out=None, eps=1e-5, block_t=None,
                 interpret=False):
    """``dense(layer_norm(r + scale·delta))`` AND the fused stream.

    Same contract as :func:`ln_dense` but the input is given as
    (residual, branch-delta): the residual add happens in VMEM and the
    summed stream is returned as a second output (in r.dtype) — one stream
    read + one write replace the XLA chain's add-pass plus re-read.

    Returns: (proj [B, t_out or T, sum(Ni)] in w.dtype,
              stream [B, t_out or T, D] in r.dtype — rows beyond T are
              garbage when t_out > T; slice or mask downstream).
    """
    ws = w if isinstance(w, (tuple, list)) else (w,)
    cs = c if isinstance(c, (tuple, list)) else (c,) * len(ws)
    b, t, d = r.shape
    ns = [wi.shape[1] for wi in ws]
    n = sum(ns)
    to = t if t_out is None else t_out
    assert to >= t and (t_out is None or (to % 128 == 0 and to - t < 128))
    if block_t is None:
        block_t = next((bt for bt in (256, 192, 128) if to % bt == 0), 128)
    bt = min(block_t, to)
    cs = tuple(jnp.zeros((ni,), jnp.float32) if ci is None else ci
               for ni, ci in zip(ns, cs))

    grid = (b, -(-to // bt))
    out, stream = pl.pallas_call(
        functools.partial(_kernel_add, t=t, bt=bt, eps=eps, act=activation,
                          nseg=len(ws), scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((b, to, n), ws[0].dtype),
            jax.ShapeDtypeStruct((b, to, d), r.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bt, d), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, bt, d), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, d), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, d), lambda bi, ti: (0, 0)),
        ] + [pl.BlockSpec((d, ni), lambda bi, ti: (0, 0)) for ni in ns]
          + [pl.BlockSpec((1, ni), lambda bi, ti: (0, 0)) for ni in ns],
        out_specs=(
            pl.BlockSpec((1, bt, n), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, bt, d), lambda bi, ti: (bi, ti, 0)),
        ),
        interpret=interpret,
    )(
        r,
        delta,
        ln_scale.astype(jnp.float32).reshape(1, d),
        ln_bias.astype(jnp.float32).reshape(1, d),
        *ws,
        *(ci.astype(jnp.float32).reshape(1, -1) for ci in cs),
    )
    return out, stream


def _ln_dense_add_xla(r, delta, ln_scale, ln_bias, w, c, scale, activation,
                      t_out, eps=1e-5):
    stream = r.astype(jnp.float32) + scale * delta.astype(jnp.float32)
    out = _xla_reference(stream, ln_scale, ln_bias, w, c, activation, t_out,
                         eps)
    return out, stream.astype(r.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def ln_dense_add_diff(r, delta, ln_scale, ln_bias, w, c, scale=1.0,
                      activation=None, t_out=None, eps=1e-5):
    """Differentiable ln_dense_add: Pallas forward, XLA backward."""
    return ln_dense_add(r, delta, ln_scale, ln_bias, w, c, scale=scale,
                        activation=activation, t_out=t_out, eps=eps)


def _lda_fwd(r, delta, ln_scale, ln_bias, w, c, scale, activation, t_out, eps):
    return ln_dense_add_diff(r, delta, ln_scale, ln_bias, w, c, scale,
                             activation, t_out, eps), (
        r, delta, ln_scale, ln_bias, w, c)


def _lda_bwd(scale, activation, t_out, eps, res, ct):
    r, delta, ln_scale, ln_bias, w, c = res
    _, vjp = jax.vjp(
        lambda *a: _ln_dense_add_xla(*a, scale, activation, t_out, eps),
        r, delta, ln_scale, ln_bias, w, c)
    return vjp(ct)


ln_dense_add_diff.defvjp(_lda_fwd, _lda_bwd)


def _add_ln_kernel(len_ref, r_ref, y_ref, g_ref, b_ref, out_ref, *, bt,
                   scale, eps):
    xr = r_ref[0].astype(jnp.float32) + scale * y_ref[0].astype(jnp.float32)
    mean = jnp.mean(xr, axis=-1, keepdims=True)
    cent = xr - mean
    var = jnp.mean(jnp.square(cent), axis=-1, keepdims=True)
    xn = cent * jax.lax.rsqrt(var + eps) * g_ref[0] + b_ref[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (xn.shape[0], 1), 0) \
        + pl.program_id(1) * bt
    valid = row < len_ref[pl.program_id(0)]
    out_ref[0] = jnp.where(valid, xn, 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "eps", "out_dtype",
                                             "block_t", "interpret"))
def add_ln(r, y, lengths, ln_scale, ln_bias, *, scale=1.0, eps=1e-5,
           out_dtype=None, block_t=None, interpret=False):
    """Fused residual tail of a Conformer block:
    ``mask(layer_norm(r + scale·y))`` in ONE pass over the stream.

    The plain path costs three full [B, T, D] fp32 stream round-trips
    (the residual add, the final LayerNorm, the valid-length re-zeroing);
    this kernel reads r and y once and writes the masked normalized stream
    once. Numerics match the XLA chain (fp32 stats). Parity + wiring gated
    in tests/test_ln_dense.py / tests/test_fastconformer.py.

    Args:
      r: [B, T, D] residual stream (fp32)
      y: [B, T, D] branch output (any float dtype), scaled by ``scale``
      lengths: [B] int32 valid frame counts (rows beyond are zeroed)
      ln_scale, ln_bias: [D] LayerNorm affine params

    Returns: [B, T, D] in ``out_dtype`` (default r.dtype).
    """
    b, t, d = r.shape
    out_dtype = out_dtype or r.dtype
    if block_t is None:
        block_t = next((bt for bt in (256, 192, 128) if t % bt == 0), t)
    bt = min(block_t, t)
    grid = (b, -(-t // bt))
    return pl.pallas_call(
        functools.partial(_add_ln_kernel, bt=bt, scale=scale, eps=eps),
        out_shape=jax.ShapeDtypeStruct((b, t, d), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bt, d), lambda bi, ti, lens: (bi, ti, 0)),
                pl.BlockSpec((1, bt, d), lambda bi, ti, lens: (bi, ti, 0)),
                pl.BlockSpec((1, d), lambda bi, ti, lens: (0, 0)),
                pl.BlockSpec((1, d), lambda bi, ti, lens: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bt, d), lambda bi, ti, lens: (bi, ti, 0)),
        ),
        interpret=interpret,
    )(
        lengths.astype(jnp.int32),
        r,
        y,
        ln_scale.astype(jnp.float32).reshape(1, d),
        ln_bias.astype(jnp.float32).reshape(1, d),
    )


def _add_ln_xla(r, y, lengths, ln_scale, ln_bias, scale, eps, out_dtype):
    xr = r.astype(jnp.float32) + scale * y.astype(jnp.float32)
    mean = jnp.mean(xr, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xr - mean), axis=-1, keepdims=True)
    xn = (xr - mean) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
    mask = jnp.arange(r.shape[1])[None, :] < lengths[:, None]
    return jnp.where(mask[..., None], xn, 0.0).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def add_ln_diff(r, y, lengths, ln_scale, ln_bias, scale=1.0, eps=1e-5,
                out_dtype=None):
    """Differentiable add_ln: Pallas forward, XLA-formulation backward."""
    return add_ln(r, y, lengths, ln_scale, ln_bias, scale=scale, eps=eps,
                  out_dtype=out_dtype)


def _aln_fwd(r, y, lengths, ln_scale, ln_bias, scale, eps, out_dtype):
    return add_ln_diff(r, y, lengths, ln_scale, ln_bias, scale, eps,
                       out_dtype), (r, y, lengths, ln_scale, ln_bias)


def _aln_bwd(scale, eps, out_dtype, res, ct):
    r, y, lengths, ln_scale, ln_bias = res
    out_dt = out_dtype or r.dtype
    _, vjp = jax.vjp(
        lambda r_, y_, g_, b_: _add_ln_xla(r_, y_, lengths, g_, b_, scale,
                                           eps, out_dt),
        r, y, ln_scale, ln_bias)
    dr, dy, dg, db = vjp(ct)
    return dr, dy, None, dg, db


add_ln_diff.defvjp(_aln_fwd, _aln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def ln_dense_diff(x, ln_scale, ln_bias, w, c, activation=None, t_out=None,
                  eps=1e-5):
    """Differentiable ln_dense: Pallas forward, XLA-formulation backward
    (same pattern as ops/relpos_attention.relpos_attention_diff)."""
    return ln_dense(x, ln_scale, ln_bias, w, c, activation=activation,
                    t_out=t_out, eps=eps)


def _fwd(x, ln_scale, ln_bias, w, c, activation, t_out, eps):
    return ln_dense_diff(x, ln_scale, ln_bias, w, c, activation, t_out,
                         eps), (x, ln_scale, ln_bias, w, c)


def _bwd(activation, t_out, eps, res, ct):
    x, ln_scale, ln_bias, w, c = res
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, activation, t_out, eps), x, ln_scale,
        ln_bias, w, c)
    return vjp(ct)


ln_dense_diff.defvjp(_fwd, _bwd)
