"""Pallas TPU kernel: relative-position multi-head attention (forward).

The Conformer encoders' hot op. The XLA path materializes two [B, H, T, T]
fp32 score tensors (content + shifted position) plus softmax probabilities in
HBM per layer — at the 619M config that is the encoder's dominant memory
traffic. This kernel computes, per (batch·head, query-block):

    scores = (q_u·kᵀ + shift(q_v·posᵀ)) / √dh  →  masked softmax  →  ·v

entirely in VMEM: the [BQ, T] score tile never touches HBM. The relative-
position shift (row r of the block needs table index T-1-(t0+r)+s for key s)
is linear in the row, so it lowers to a STRIDED hardware rotate — one
uniform base roll plus one stride-1 per-row roll (tpu.dynamic_rotate).

Numerics match the XLA reference (fp32 accumulation, fp32 softmax); parity
gated in tests/test_pallas_attention.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "relpos_attention",
    "relpos_attention_blockwise",
    "relpos_attention_fused",
    "relpos_attention_fused_diff",
    "relpos_attention_fused_packed",
    "relpos_attention_fused_packed_diff",
    "fused_supported",
]


def _kernel(lens_ref, qu_ref, qv_ref, k_ref, v_ref, pos_ref, out_ref, *, t, bq, dh, w):
    i = pl.program_id(1)  # query block index
    t0 = i * bq

    qu = qu_ref[0]  # [BQ, dh]
    qv = qv_ref[0]
    k = k_ref[0]  # [T, dh]
    v = v_ref[0]
    pos = pos_ref[0]  # [W, dh], W = 2T-1 (+query padding)

    ac = jnp.dot(qu, k.T, preferred_element_type=jnp.float32)  # [BQ, T]
    bd_all = jnp.dot(qv, pos.T, preferred_element_type=jnp.float32)  # [BQ, W]

    # per-row left shift: row r wants bd_all[r, (T-1-t0-r) + s]. A left-roll
    # by (T-1-t0-r) is a right-roll by w-(T-1-t0)+r — linear in the row, so
    # ONE strided hardware rotate does all rows (rows past the valid length
    # wrap to garbage and are cropped/masked by the caller).
    # two rotates: a uniform base roll, then the per-row +r stride (Mosaic
    # rejects some combined base+stride shift ranges)
    bd = pltpu.roll(bd_all, w - (t - 1 - t0), 1)
    bd = pltpu.roll(bd, 0, 1, stride=1, stride_axis=0)[:, :t]

    scores = (ac + bd) * (1.0 / np.sqrt(dh))

    valid_len = lens_ref[pl.program_id(0)]
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, t), 1)
    scores = jnp.where(col < valid_len, scores, jnp.float32(-1e30))

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)

    out_ref[0] = jnp.dot(
        probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def relpos_attention(qu, qv, k, v, pos, lengths, block_q=256, interpret=False):
    """Relative-position attention forward.

    Args:
      qu: [B, H, T, dh] query + content bias (q + u)
      qv: [B, H, T, dh] query + position bias (q + v)
      k, v: [B, H, T, dh]
      pos: [2T-1, H, dh] projected relative-position table, offsets ordered
        [T-1 ... -(T-1)]
      lengths: [B] int32 valid key counts

    Returns: [B, H, T, dh] fp32.
    """
    b, h, t, dh = qu.shape
    bq = min(block_q, t)
    t_pad = -(-t // bq) * bq
    if t_pad != t:
        padq = ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
        qu = jnp.pad(qu, padq)
        qv = jnp.pad(qv, padq)

    bh = b * h
    qu = qu.reshape(bh, t_pad, dh)
    qv = qv.reshape(bh, t_pad, dh)
    k = k.reshape(bh, t, dh)
    v = v.reshape(bh, t, dh)
    pos_h = jnp.transpose(pos, (1, 0, 2))  # [H, 2T-1, dh]
    # strided rotate needs a 128-aligned lane width; zero rows at the table
    # end never reach valid columns (wrap lands past column t)
    w = -(-pos_h.shape[1] // 128) * 128
    if w != pos_h.shape[1]:
        pos_h = jnp.pad(pos_h, ((0, 0), (0, w - pos_h.shape[1]), (0, 0)))
    lengths_rep = jnp.repeat(lengths.astype(jnp.int32), h)  # [B*H]

    grid = (bh, t_pad // bq)

    out = pl.pallas_call(
        functools.partial(_kernel, t=t, bq=bq, dh=dh, w=w),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, dh), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, dh), lambda g, i, lens: (g, i, 0)),
                pl.BlockSpec((1, bq, dh), lambda g, i, lens: (g, i, 0)),
                pl.BlockSpec((1, t, dh), lambda g, i, lens: (g, 0, 0)),
                pl.BlockSpec((1, t, dh), lambda g, i, lens: (g, 0, 0)),
                pl.BlockSpec((1, w, dh), lambda g, i, lens, _h=h: (g % _h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, dh), lambda g, i, lens: (g, i, 0)),
        ),
        interpret=interpret,
    )(lengths_rep, qu, qv, k, v, pos_h)
    return out.reshape(b, h, t_pad, dh)[:, :, :t]


# ---------------------------------------------------------------------------
# blockwise-KV (flash-style) variant: no T cap
# ---------------------------------------------------------------------------
#
# The single-pass kernel above holds k/v/pos and a [BQ, 2T-1] score row in
# VMEM — beyond ~1k key frames that overflows. This variant streams KV
# blocks with the standard online-softmax recurrence (running max/sum and a
# rescaled accumulator in VMEM scratch), so VMEM use is independent of T.
#
# The relative-position trick: with BQ == BK == BLK and T padded to a
# multiple of BLK, the pos-table indices needed by the (i, j) block pair,
#   l = (T-1) - (i·BLK + r) + (j·BLK + c),
# span exactly the 2·BLK-1 window starting at the BLOCK-ALIGNED offset
# (T/BLK - 1 + j - i)·BLK — so two consecutive BLK-row slices of the (zero-
# padded to 2T rows) table cover it, fetched by plain BlockSpec index maps;
# bd[r, c] is then bd_full[r, (BLK-1-r) + c], the same strided-rotate
# shift as above with shift = BLK-1-r.


def _blockwise_kernel(lens_ref, qu_ref, qv_ref, k_ref, v_ref, pos1_ref,
                      pos2_ref, out_ref, m_ref, l_ref, acc_ref, *, blk, dh,
                      n_kv):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full((blk, 1), -jnp.inf, jnp.float32)
        l_ref[:] = jnp.zeros((blk, 1), jnp.float32)
        acc_ref[:] = jnp.zeros((blk, dh), jnp.float32)

    qu = qu_ref[0]  # [BLK, dh]
    qv = qv_ref[0]
    k = k_ref[0]  # [BLK, dh]
    v = v_ref[0]
    pos = jnp.concatenate([pos1_ref[0], pos2_ref[0]], axis=0)  # [2BLK, dh]

    ac = jnp.dot(qu, k.T, preferred_element_type=jnp.float32)  # [BLK, BLK]
    bd_full = jnp.dot(qv, pos.T, preferred_element_type=jnp.float32)  # [BLK, 2BLK]

    # left-roll row r by (blk-1-r) == right-roll by (blk+1)+r: one strided
    # rotate (see the single-pass kernel note)
    bd = pltpu.roll(bd_full, blk + 1, 1)
    bd = pltpu.roll(bd, 0, 1, stride=1, stride_axis=0)[:, :blk]

    s = (ac + bd) * (1.0 / np.sqrt(dh))
    valid_len = lens_ref[pl.program_id(0)]
    col = j * blk + jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    s = jnp.where(col < valid_len, s, jnp.float32(-1e30))

    m_prev, l_prev = m_ref[:], l_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(j == n_kv - 1)
    def _finalize():
        out_ref[0] = (acc_ref[:] / l_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "interpret",
                                             "round_lanes"))
def relpos_attention_blockwise(qu, qv, k, v, pos, lengths, block=256,
                               interpret=False, round_lanes=None):
    """Rel-pos attention with streamed KV blocks (any T; see module notes).

    Same contract as relpos_attention; use for T beyond the single-pass
    kernel's VMEM budget (long-form unchunked audio).
    """
    b, h, t, dh = qu.shape
    # the in-kernel strided rotate runs on a [blk, 2*blk] tile, which needs a
    # 128-aligned lane width -> blk must be a multiple of 64 on hardware.
    # ``round_lanes`` defaults to the hardware behavior (interpret mode keeps
    # tiny test blocks as-is) but can be forced on so interpret-mode tests
    # cover the real rounded geometry, incl. blk > t when t < 64.
    if round_lanes is None:
        round_lanes = not interpret
    blk = min(block, t)
    if round_lanes:
        blk = -(-blk // 64) * 64
    t_pad = -(-t // blk) * blk
    padq = ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
    if t_pad != t:
        qu = jnp.pad(qu, padq)
        qv = jnp.pad(qv, padq)
        k = jnp.pad(k, padq)
        v = jnp.pad(v, padq)
    bh = b * h
    qu = qu.reshape(bh, t_pad, dh)
    qv = qv.reshape(bh, t_pad, dh)
    k = k.reshape(bh, t_pad, dh)
    v = v.reshape(bh, t_pad, dh)

    # re-index the [2t-1] table into padded space: l_pad = (t_pad - t) + l,
    # then zero-fill to 2·t_pad rows (block-aligned fetches)
    off = t_pad - t
    pos_h = jnp.transpose(pos, (1, 0, 2))  # [H, 2t-1, dh]
    pos_h = jnp.pad(pos_h, ((0, 0), (off, 2 * t_pad - (2 * t - 1) - off), (0, 0)))
    lengths_rep = jnp.repeat(lengths.astype(jnp.int32), h)

    n_q = t_pad // blk
    m0 = n_q  # t_pad / blk
    grid = (bh, n_q, n_q)  # (g, query block i, kv block j) — j fastest

    out = pl.pallas_call(
        functools.partial(_blockwise_kernel, blk=blk, dh=dh, n_kv=n_q),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, dh), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, blk, dh), lambda g, i, j, lens: (g, i, 0)),
                pl.BlockSpec((1, blk, dh), lambda g, i, j, lens: (g, i, 0)),
                pl.BlockSpec((1, blk, dh), lambda g, i, j, lens: (g, j, 0)),
                pl.BlockSpec((1, blk, dh), lambda g, i, j, lens: (g, j, 0)),
                pl.BlockSpec(
                    (1, blk, dh),
                    lambda g, i, j, lens, _h=h, _m=m0: (g % _h, _m - 1 + j - i, 0),
                ),
                pl.BlockSpec(
                    (1, blk, dh),
                    lambda g, i, j, lens, _h=h, _m=m0: (g % _h, _m + j - i, 0),
                ),
            ],
            out_specs=pl.BlockSpec((1, blk, dh), lambda g, i, j, lens: (g, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((blk, 1), jnp.float32),
                pltpu.VMEM((blk, 1), jnp.float32),
                pltpu.VMEM((blk, dh), jnp.float32),
            ],
        ),
        interpret=interpret,
    )(lengths_rep, qu, qv, k, v, pos_h, pos_h)
    return out.reshape(b, h, t_pad, dh)[:, :, :t]


# ---------------------------------------------------------------------------
# layout-fused variant: [B, T, D] in/out, biases added in-kernel
# ---------------------------------------------------------------------------
#
# The single-pass kernel above wants [B·H, T, dh] inputs, which costs the
# caller four HBM transposes of [B, H, T, dh] plus two full-tensor bias adds
# per layer — measured at B=32/T=375/D=1024 that wrapper traffic exceeds the
# kernel itself (~55 ms vs ~40 ms over 24 layers). This variant reads q/k/v
# exactly as the projection denses produce them ([B, T, D]) by blocking the
# LANE dimension per head: block (1, t_pad, dh) at index (b, 0, h). One grid
# step covers a head's whole query range (t_pad = T rounded up to 128), the
# u/v biases are added in-kernel, and the output is written back as
# [B, T, D] in the compute dtype — directly consumable by the out-projection.
#
# Lane-blocking requires the block's last dim to be a multiple of 128, so
# heads are packed `hpb = 128 // dh` per block when dh < 128 (espnet's
# dh=64) and the kernel loops over the packed sub-heads.


def fused_supported(t, heads, dh):
    """Shapes the fused kernel serves: lane-divisible head packing and a
    single-q-block score tile within VMEM (t_pad <= 512)."""
    if dh > 128 or 128 % dh != 0:
        return False
    if heads % (128 // dh) != 0:
        return False
    return -(-t // 128) * 128 <= 512


def _fused_kernel(lens_ref, q_ref, k_ref, v_ref, pos_ref, bu_ref, bv_ref,
                  out_ref, *, t, t_pad, dh, w, hpb, nb=1):
    col = jax.lax.broadcasted_iota(jnp.int32, (t_pad, t_pad), 1)

    # nb batch items per grid step (static loop): serving tiles are small
    # ([t_pad, 128] per tensor), so per-step pipeline overhead dominates a
    # one-item grid — batching items amortizes it
    for j in range(nb):
        valid = lens_ref[pl.program_id(1) * nb + j]
        outs = []
        for s in range(hpb):  # packed sub-heads (static loop; hpb = 128/dh)
            sl = slice(s * dh, (s + 1) * dh)
            q = q_ref[j][:, sl]  # [t_pad, dh]
            k = k_ref[j][:, sl]
            v = v_ref[j][:, sl]
            pos = pos_ref[0][:, sl]  # [W, dh]
            qu = q + bu_ref[0][:, sl]
            qv = q + bv_ref[0][:, sl]

            ac = jnp.dot(qu, k.T, preferred_element_type=jnp.float32)
            bd_all = jnp.dot(qv, pos.T, preferred_element_type=jnp.float32)

            # one strided rotate: left-roll row r by (t-1-r) (see _kernel note)
            bd = pltpu.roll(bd_all, w - (t - 1), 1)
            bd = pltpu.roll(bd, 0, 1, stride=1, stride_axis=0)[:, :t_pad]

            scores = (ac + bd) * (1.0 / np.sqrt(dh))
            scores = jnp.where(col < valid, scores, jnp.float32(-1e30))

            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            outs.append(jnp.dot(probs.astype(v.dtype), v,
                                preferred_element_type=jnp.float32))
        out = outs[0] if hpb == 1 else jnp.concatenate(outs, axis=-1)
        out_ref[j] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def relpos_attention_fused(q, k, v, pos, bias_u, bias_v, lengths, heads,
                           interpret=False):
    """Rel-pos attention on projection-layout tensors.

    Args:
      q, k, v: [B, T, D] (D = heads·dh), straight from the q/k/v denses
      pos: [2T-1, H, dh] projected relative-position table
      bias_u, bias_v: [H, dh] content/position biases (added to q in-kernel)
      lengths: [B] int32 valid key counts

    Returns: [B, T, D] in q.dtype. Requires fused_supported(T, dh).
    """
    b, tt, d = q.shape
    h = heads
    dh = d // h
    # heads per lane block: dh·hpb == 128 on TPU (fused_supported gates
    # h % (128//dh) == 0); interpret-mode tests with tiny dh just cap at h
    hpb = min(128 // dh, h)
    t_pad = -(-tt // 128) * 128
    if t_pad != tt:
        p3 = ((0, 0), (0, t_pad - tt), (0, 0))
        q = jnp.pad(q, p3)
        k = jnp.pad(k, p3)
        v = jnp.pad(v, p3)
    # [2T-1, H, dh] -> [H/hpb, W, hpb*dh]: packed heads side by side on lanes
    w = pos.shape[0]
    pos_h = jnp.transpose(pos, (1, 0, 2))  # [H, W, dh]
    pos_h = pos_h.reshape(h // hpb, hpb, w, dh)
    pos_h = jnp.transpose(pos_h, (0, 2, 1, 3)).reshape(h // hpb, w, hpb * dh)
    w_pad = -(-w // 128) * 128
    if w_pad != w:
        pos_h = jnp.pad(pos_h, ((0, 0), (0, w_pad - w), (0, 0)))
    bu = bias_u.astype(q.dtype).reshape(h // hpb, 1, hpb * dh)
    bv = bias_v.astype(q.dtype).reshape(h // hpb, 1, hpb * dh)

    nb = next(x for x in (8, 4, 2, 1) if b % x == 0)
    grid = (h // hpb, b // nb)  # head blocks outer: pos/bias cached across batch
    out = pl.pallas_call(
        functools.partial(_fused_kernel, t=tt, t_pad=t_pad, dh=dh, w=w_pad,
                          hpb=hpb, nb=nb),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, d), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((nb, t_pad, hpb * dh), lambda hi, bi, lens: (bi, 0, hi)),
                pl.BlockSpec((nb, t_pad, hpb * dh), lambda hi, bi, lens: (bi, 0, hi)),
                pl.BlockSpec((nb, t_pad, hpb * dh), lambda hi, bi, lens: (bi, 0, hi)),
                pl.BlockSpec((1, w_pad, hpb * dh), lambda hi, bi, lens: (hi, 0, 0)),
                pl.BlockSpec((1, 1, hpb * dh), lambda hi, bi, lens: (hi, 0, 0)),
                pl.BlockSpec((1, 1, hpb * dh), lambda hi, bi, lens: (hi, 0, 0)),
            ],
            out_specs=pl.BlockSpec((nb, t_pad, hpb * dh),
                                   lambda hi, bi, lens: (bi, 0, hi)),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, k, v, pos_h, bu, bv)
    return out[:, :tt]


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def relpos_attention_fused_packed(qkv, pos, bias_u, bias_v, lengths, heads,
                                  interpret=False):
    """Fused attention reading q/k/v straight out of ONE packed [B, T, 3D]
    projection (the ln_dense qkv output, ops/ln_dense.py): three BlockSpecs
    at different lane offsets on the same array, so no slice/pad copies ever
    touch HBM. T must already be 128-aligned (ln_dense ``t_out``) and rows
    past the true length zero; ``pos`` is the [2T-1, H, dh] table built at
    this T (offset-indexed, so padding T only widens the table).
    """
    b, t_pad, d3 = qkv.shape
    d = d3 // 3
    h = heads
    dh = d // h
    hpb = min(128 // dh, h)
    w = pos.shape[0]
    pos_h = jnp.transpose(pos, (1, 0, 2))
    pos_h = pos_h.reshape(h // hpb, hpb, w, dh)
    pos_h = jnp.transpose(pos_h, (0, 2, 1, 3)).reshape(h // hpb, w, hpb * dh)
    w_pad = -(-w // 128) * 128
    if w_pad != w:
        pos_h = jnp.pad(pos_h, ((0, 0), (0, w_pad - w), (0, 0)))
    bu = bias_u.astype(qkv.dtype).reshape(h // hpb, 1, hpb * dh)
    bv = bias_v.astype(qkv.dtype).reshape(h // hpb, 1, hpb * dh)

    nlb = d // (hpb * dh)  # lane blocks per tensor within the packed axis
    nb = next(x for x in (8, 4, 2, 1) if b % x == 0)
    grid = (h // hpb, b // nb)
    lane = hpb * dh
    out = pl.pallas_call(
        functools.partial(_fused_kernel, t=t_pad, t_pad=t_pad, dh=dh,
                          w=w_pad, hpb=hpb, nb=nb),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, d), qkv.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((nb, t_pad, lane), lambda hi, bi, lens: (bi, 0, hi)),
                pl.BlockSpec((nb, t_pad, lane),
                             lambda hi, bi, lens: (bi, 0, hi + nlb)),
                pl.BlockSpec((nb, t_pad, lane),
                             lambda hi, bi, lens: (bi, 0, hi + 2 * nlb)),
                pl.BlockSpec((1, w_pad, lane), lambda hi, bi, lens: (hi, 0, 0)),
                pl.BlockSpec((1, 1, lane), lambda hi, bi, lens: (hi, 0, 0)),
                pl.BlockSpec((1, 1, lane), lambda hi, bi, lens: (hi, 0, 0)),
            ],
            out_specs=pl.BlockSpec((nb, t_pad, lane),
                                   lambda hi, bi, lens: (bi, 0, hi)),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), qkv, qkv, qkv, pos_h, bu, bv)
    return out


def _fused_packed_xla_reference(qkv, pos, bias_u, bias_v, lengths):
    d = qkv.shape[-1] // 3
    return _fused_xla_reference(qkv[..., :d], qkv[..., d:2 * d],
                                qkv[..., 2 * d:], pos, bias_u, bias_v,
                                lengths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def relpos_attention_fused_packed_diff(qkv, pos, bias_u, bias_v, lengths,
                                       heads):
    """Differentiable packed fused attention: Pallas forward, XLA-VJP
    backward (same pattern as relpos_attention_fused_diff)."""
    return relpos_attention_fused_packed(qkv, pos, bias_u, bias_v, lengths,
                                         heads=heads)


def _fused_packed_fwd(qkv, pos, bias_u, bias_v, lengths, heads):
    return (
        relpos_attention_fused_packed_diff(qkv, pos, bias_u, bias_v, lengths,
                                           heads),
        (qkv, pos, bias_u, bias_v, lengths),
    )


def _fused_packed_bwd(heads, res, g):
    qkv, pos, bias_u, bias_v, lengths = res
    _, vjp = jax.vjp(
        lambda a, b_, c, d: _fused_packed_xla_reference(a, b_, c, d, lengths),
        qkv, pos, bias_u, bias_v,
    )
    dqkv, dpos, dbu, dbv = vjp(g.astype(jnp.float32))
    dlengths = np.zeros(lengths.shape, dtype=jax.dtypes.float0)
    return (dqkv.astype(qkv.dtype), dpos.astype(pos.dtype),
            dbu.astype(bias_u.dtype), dbv.astype(bias_v.dtype), dlengths)


relpos_attention_fused_packed_diff.defvjp(_fused_packed_fwd,
                                          _fused_packed_bwd)


def _fused_xla_reference(q, k, v, pos, bias_u, bias_v, lengths):
    """[B, T, D]-layout XLA formulation (fp32), the fused kernel's backward."""
    b, t, d = q.shape
    h, dh = bias_u.shape
    f32 = lambda x: x.astype(jnp.float32)
    r = lambda x: jnp.transpose(f32(x).reshape(b, t, h, dh), (0, 2, 1, 3))
    qu = r(q) + f32(bias_u)[None, :, None, :]
    qv = r(q) + f32(bias_v)[None, :, None, :]
    out = _xla_reference(qu, qv, r(k), r(v), pos, lengths)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def relpos_attention_fused_diff(q, k, v, pos, bias_u, bias_v, lengths, heads):
    """Differentiable fused attention: Pallas forward, XLA-VJP backward
    (same contract as relpos_attention_diff, projection layout)."""
    return relpos_attention_fused(q, k, v, pos, bias_u, bias_v, lengths,
                                  heads=heads)


def _fused_diff_fwd(q, k, v, pos, bias_u, bias_v, lengths, heads):
    return (
        relpos_attention_fused_diff(q, k, v, pos, bias_u, bias_v, lengths,
                                    heads),
        (q, k, v, pos, bias_u, bias_v, lengths),
    )


def _fused_diff_bwd(heads, res, g):
    q, k, v, pos, bias_u, bias_v, lengths = res
    _, vjp = jax.vjp(
        lambda a, b_, c, d, e, f: _fused_xla_reference(a, b_, c, d, e, f,
                                                       lengths),
        q, k, v, pos, bias_u, bias_v,
    )
    dq, dk, dv, dpos, dbu, dbv = vjp(g.astype(jnp.float32))
    dlengths = np.zeros(lengths.shape, dtype=jax.dtypes.float0)
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
        dpos.astype(pos.dtype), dbu.astype(bias_u.dtype),
        dbv.astype(bias_v.dtype), dlengths,
    )


relpos_attention_fused_diff.defvjp(_fused_diff_fwd, _fused_diff_bwd)


# ---------------------------------------------------------------------------
# differentiable wrapper: kernel forward, XLA-derived backward
# ---------------------------------------------------------------------------


def _xla_reference(qu, qv, k, v, pos, lengths):
    """The einsum + pad/reshape-shift formulation (fp32), used as the
    backward-pass definition — its VJP is correct by construction and costs
    the same as differentiating the plain XLA path."""
    b, h, t, dh = qu.shape
    f32 = lambda x: x.astype(jnp.float32)
    ac = jnp.einsum("bhtd,bhsd->bhts", f32(qu), f32(k))
    posh = jnp.transpose(f32(pos), (1, 0, 2))
    bd = jnp.einsum("bhtd,hld->bhtl", f32(qv), posh)
    bd = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (1, 0)))
    bd = bd.reshape(b, h, 2 * t, t)[:, :, 1:].reshape(b, h, t, 2 * t - 1)[..., :t]
    scores = (ac + bd) / np.sqrt(dh)
    mask = jnp.arange(t)[None, :] < lengths[:, None]
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", probs, f32(v))


@jax.custom_vjp
def relpos_attention_diff(qu, qv, k, v, pos, lengths):
    """Differentiable rel-pos attention: the Pallas kernel on the forward
    pass (single-pass or blockwise by length), the XLA formulation's VJP on
    the backward — training gets the kernel's forward speed (twice, under
    remat) with autodiff-correct gradients."""
    t = qu.shape[2]
    kernel = relpos_attention if t <= 1024 else relpos_attention_blockwise
    return kernel(qu, qv, k, v, pos, lengths)


def _diff_fwd(qu, qv, k, v, pos, lengths):
    return relpos_attention_diff(qu, qv, k, v, pos, lengths), (
        qu, qv, k, v, pos, lengths,
    )


def _diff_bwd(res, g):
    qu, qv, k, v, pos, lengths = res
    _, vjp = jax.vjp(
        lambda a, b_, c, d, e: _xla_reference(a, b_, c, d, e, lengths),
        qu, qv, k, v, pos,
    )
    dqu, dqv, dk, dv, dpos = vjp(g.astype(jnp.float32))
    dlengths = np.zeros(lengths.shape, dtype=jax.dtypes.float0)
    return (
        dqu.astype(qu.dtype), dqv.astype(qv.dtype), dk.astype(k.dtype),
        dv.astype(v.dtype), dpos.astype(pos.dtype), dlengths,
    )


relpos_attention_diff.defvjp(_diff_fwd, _diff_bwd)
