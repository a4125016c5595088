"""Zipformer2 encoder (TPU-native JAX).

First-party replacement for the k2/icefall Zipformer transducer encoder that
the reference reaches through sherpa-onnx's ONNX graphs
(pkg/k2-asr/src/huggingface.py:73-83). Structure follows the zipformer2
architecture: a conv embed (≈2× time reduction), a U-Net-like series of
encoder stacks at per-stack downsampling factors with channel widths that
grow then shrink, and a final 2× output downsample — 0.04 s per output frame
at a 10 ms fbank hop.

Zipformer-specific modules implemented here:
- BiasNorm (x · γ / RMS(x − β)) instead of LayerNorm;
- SwooshL/SwooshR activations;
- shared attention weights: each layer computes softmax attention weights
  ONCE and reuses them for two self-attention (value-projection) modules and
  a nonlinear-attention module;
- learned per-channel bypass (identity-biased residual scaling);
- SimpleDownsample (learned softmax-weighted frame pooling) and
  SimpleUpsample (frame repetition) around each stack;
- channel-count changes between stacks by zero-pad / truncate (no
  projection), as in icefall's convert_num_channels.

Training-only operators of the original (ActivationBalancer, Whiten,
ScheduledFloat dropouts) are identity at inference and are not reproduced.

Everything is static-shape; identical layers within a stack run under
lax.scan (one compiled block body per stack).
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layers import conv2d, conv2d_init, dense, dense_init, depthwise_conv1d, depthwise_conv1d_init

__all__ = [
    "ZipformerConfig",
    "init_zipformer",
    "zipformer_encode",
    "zipformer_output_length",
    "swoosh_l",
    "swoosh_r",
]


@dataclass(frozen=True)
class ZipformerConfig:
    feat_in: int = 80
    num_layers: Tuple[int, ...] = (2, 2, 4, 5, 4, 2)
    downsampling: Tuple[int, ...] = (1, 2, 4, 8, 4, 2)
    encoder_dim: Tuple[int, ...] = (192, 256, 512, 768, 512, 256)
    ffn_dim: Tuple[int, ...] = (512, 768, 1536, 2048, 1536, 768)
    num_heads: Tuple[int, ...] = (4, 4, 4, 8, 4, 4)
    cnn_kernel: Tuple[int, ...] = (31, 31, 15, 15, 15, 31)
    query_head_dim: int = 32
    value_head_dim: int = 12
    pos_head_dim: int = 4
    pos_dim: int = 48
    embed_channels: Tuple[int, ...] = (8, 32, 128)
    output_downsampling: int = 2
    # attention implementation: "xla" (materialized [B,H,T,T] weights shared
    # by the three consumers) or "pallas" (ops/zipformer_attention.py:
    # scores recomputed in VMEM per application, weights never hit HBM)
    attn_impl: str = "xla"
    compute_dtype: str = "bfloat16"
    # dtype of the stream between layers/stacks (bf16 halves norm/bypass HBM
    # traffic; BiasNorm statistics always accumulate in fp32)
    residual_dtype: str = "float32"

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def out_dim(self) -> int:
        return max(self.encoder_dim)

    @staticmethod
    def large(**overrides) -> "ZipformerConfig":
        """~150M-class encoder matching the published reazonspeech-k2-v2
        (159M with the stateless decoder/joiner, README.rst:28)."""
        return ZipformerConfig(**overrides)

    @staticmethod
    def tiny(**overrides) -> "ZipformerConfig":
        cfg = dict(
            num_layers=(1, 1, 1),
            downsampling=(1, 2, 4),
            encoder_dim=(32, 48, 64),
            ffn_dim=(48, 64, 96),
            num_heads=(2, 2, 2),
            cnn_kernel=(7, 7, 7),
            query_head_dim=8,
            value_head_dim=4,
            pos_head_dim=2,
            pos_dim=12,
            embed_channels=(4, 8, 16),
        )
        cfg.update(overrides)
        return ZipformerConfig(**cfg)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def swoosh_l(x):
    """SwooshL(x) = log(1 + e^(x-4)) - 0.08x - 0.035"""
    return jnp.logaddexp(0.0, x - 4.0) - 0.08 * x - 0.035


def swoosh_r(x):
    """SwooshR(x) = log(1 + e^(x-1)) - 0.08x - 0.313"""
    return jnp.logaddexp(0.0, x - 1.0) - 0.08 * x - 0.313


def bias_norm_init(dim):
    return {"bias": jnp.zeros((dim,)), "log_scale": jnp.zeros(())}


def bias_norm(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    rms = jnp.sqrt(
        jnp.mean(jnp.square(x32 - p["bias"]), axis=-1, keepdims=True) + eps
    )
    return (x32 * (jnp.exp(p["log_scale"]) / rms)).astype(x.dtype)


def bypass_init(dim, initial=0.5):
    return {"scale": jnp.full((dim,), initial)}


def bypass_apply(p, x_orig, x):
    c = jnp.clip(p["scale"], 0.0, 1.0).astype(jnp.float32)
    return (x_orig.astype(jnp.float32) * (1.0 - c) + x.astype(jnp.float32) * c)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_layer(key, si: int, cfg: ZipformerConfig):
    d = cfg.encoder_dim[si]
    h = cfg.num_heads[si]
    ffn = cfg.ffn_dim[si]
    qd, vd, pd = cfg.query_head_dim, cfg.value_head_dim, cfg.pos_head_dim
    hidden = d * 3 // 4
    keys = iter(jax.random.split(key, 24))
    p = {
        # shared attention weights: one in_proj emits per-head (q, k, p) —
        # q/k of query_head_dim and a SEPARATE pos-query slice of
        # pos_head_dim (icefall RelPositionMultiheadAttentionWeights layout)
        "attn_qkp": dense_init(next(keys), d, h * (2 * qd + pd)),
        "attn_pos": dense_init(next(keys), cfg.pos_dim, h * pd, bias=False),
        # two value-attention modules sharing the weights
        "sa1_v": dense_init(next(keys), d, h * vd),
        "sa1_out": dense_init(next(keys), h * vd, d),
        "sa2_v": dense_init(next(keys), d, h * vd),
        "sa2_out": dense_init(next(keys), h * vd, d),
        # nonlinear attention
        "na_in": dense_init(next(keys), d, 3 * hidden),
        "na_out": dense_init(next(keys), hidden, d),
        # three feedforwards
        "ff1_in": dense_init(next(keys), d, ffn),
        "ff1_out": dense_init(next(keys), ffn, d),
        "ff2_in": dense_init(next(keys), d, ffn),
        "ff2_out": dense_init(next(keys), ffn, d),
        "ff3_in": dense_init(next(keys), d, ffn),
        "ff3_out": dense_init(next(keys), ffn, d),
        # two conv modules
        "cv1_in": dense_init(next(keys), d, 2 * d),
        "cv1_dw": depthwise_conv1d_init(next(keys), d, cfg.cnn_kernel[si]),
        "cv1_out": dense_init(next(keys), d, d),
        "cv2_in": dense_init(next(keys), d, 2 * d),
        "cv2_dw": depthwise_conv1d_init(next(keys), d, cfg.cnn_kernel[si]),
        "cv2_out": dense_init(next(keys), d, d),
        "norm": bias_norm_init(d),
        "bypass_mid": bypass_init(d),
        "bypass": bypass_init(d),
    }
    return p


def init_zipformer(key, cfg: ZipformerConfig):
    n_stacks = len(cfg.num_layers)
    keys = iter(jax.random.split(key, 4 + sum(cfg.num_layers) + n_stacks))

    c1, c2, c3 = cfg.embed_channels
    f_out = cfg.feat_in - 2  # k3 s(1,·) VALID over freq 3 times with stride 2
    f_out = (f_out - 1) // 2  # conv2 stride 2 in freq... computed below
    # embed: conv k3 VALID: (s_t, s_f) = (1,2), (2,2), (1,1)
    embed = {
        "conv0": conv2d_init(next(keys), 1, c1, 3),
        "conv1": conv2d_init(next(keys), c1, c2, 3),
        "conv2": conv2d_init(next(keys), c2, c3, 3),
    }
    f = cfg.feat_in
    f = (f - 3) // 2 + 1  # conv0 freq stride 2, VALID
    f = (f - 3) // 2 + 1  # conv1 freq stride 2, VALID
    f = f - 2  # conv2 freq stride 1, VALID
    embed["proj"] = dense_init(next(keys), c3 * f, cfg.encoder_dim[0])
    embed["norm"] = bias_norm_init(cfg.encoder_dim[0])

    stacks = []
    for si in range(n_stacks):
        layers = [_init_layer(next(keys), si, cfg) for _ in range(cfg.num_layers[si])]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        stack = {"layers": stacked}
        if cfg.downsampling[si] > 1:
            stack["ds_weights"] = jnp.zeros((cfg.downsampling[si],))
            stack["out_bypass"] = bypass_init(cfg.encoder_dim[si])
        stacks.append(stack)

    return {"embed": embed, "stacks": stacks}


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _embed(p, feats, lengths, cfg: ZipformerConfig):
    """[B, T, F] -> [B, T', enc_dim0]; T' = (((T-1)//1 ... )) ≈ T/2."""
    dt = cfg.dtype
    x = feats[..., None].astype(dt)
    x = swoosh_r(conv2d(p["conv0"], x, stride=(1, 2), padding="VALID", dtype=dt))
    x = swoosh_r(conv2d(p["conv1"], x, stride=(2, 2), padding="VALID", dtype=dt))
    x = swoosh_r(conv2d(p["conv2"], x, stride=(1, 1), padding="VALID", dtype=dt))
    b, t, f, c = x.shape
    x = dense(p["proj"], x.reshape(b, t, f * c), dtype=dt)
    x = bias_norm(p["norm"], x)
    # time: conv0 VALID k3 s1 (T-2), conv1 VALID k3 s2 ((T-4)//2+1 - ...),
    # conv2 VALID k3 s1 (-2): combined below
    lengths = (lengths - 2 - 3) // 2 + 1 - 2
    return x, jnp.maximum(lengths, 0)


def _compact_rel_pos(t, pos_dim):
    """Compact relative positional embedding [2T-1, pos_dim]: sinusoids over
    a log-compressed relative distance (long-range offsets share capacity,
    as in zipformer2's CompactRelPositionalEncoding)."""
    rel = np.arange(t - 1, -t, -1, dtype=np.float64)
    compressed = np.sign(rel) * np.log1p(np.abs(rel))
    half = pos_dim // 2
    freqs = np.exp(np.arange(half, dtype=np.float64) * (-np.log(100.0) / max(half - 1, 1)))
    ang = compressed[:, None] * freqs[None, :] * np.pi
    pe = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    return pe[:, :pos_dim].astype(np.float32)


def _rel_shift(x):
    """[B, H, T, 2T-1] -> [B, H, T, T] (see fastconformer._rel_shift)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, 2 * t, t)
    x = x[:, :, 1:].reshape(b, h, t, 2 * t - 1)
    return x[..., :t]


def _attn_weights(p, x, pos_emb, mask, si, cfg: ZipformerConfig):
    """Softmax attention weights [B, H, T, T], computed once per layer."""
    b, t, d = x.shape
    h, qd, pd = cfg.num_heads[si], cfg.query_head_dim, cfg.pos_head_dim
    dt = cfg.dtype
    qkp = dense(p["attn_qkp"], x, dtype=dt).reshape(b, t, h, 2 * qd + pd)
    q = qkp[..., :qd]
    k = qkp[..., qd : 2 * qd]
    qp = qkp[..., 2 * qd :]  # dedicated pos-query slice [B, T, H, pd]
    scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)

    pos = dense(p["attn_pos"], pos_emb, dtype=dt).reshape(2 * t - 1, h, pd)
    pos_scores = jnp.einsum(
        "bthd,lhd->bhtl", qp, pos, preferred_element_type=jnp.float32
    )
    scores = (scores + _rel_shift(pos_scores)) / np.sqrt(qd)
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask[:, None, None, :], scores, neg)
    return jax.nn.softmax(scores, axis=-1).astype(dt)


def _self_attn(p, prefix, x, weights, si, cfg: ZipformerConfig):
    b, t, d = x.shape
    h, vd = cfg.num_heads[si], cfg.value_head_dim
    dt = cfg.dtype
    v = dense(p[f"{prefix}_v"], x, dtype=dt).reshape(b, t, h, vd)
    out = jnp.einsum("bhts,bshd->bthd", weights, v, preferred_element_type=jnp.float32)
    return dense(p[f"{prefix}_out"], out.astype(dt).reshape(b, t, h * vd), dtype=dt)


def _nonlin_attention(p, x, weights_head0, cfg: ZipformerConfig):
    """tanh-gated channel mixing attended with one head's weights."""
    dt = cfg.dtype
    sxy = dense(p["na_in"], x, dtype=dt)
    s, v, y = jnp.split(sxy, 3, axis=-1)
    v = jnp.tanh(s) * v
    attended = jnp.einsum(
        "bts,bsd->btd", weights_head0, v, preferred_element_type=jnp.float32
    ).astype(dt)
    return dense(p["na_out"], attended * y, dtype=dt)


def _ffn(p, prefix, x, cfg: ZipformerConfig):
    dt = cfg.dtype
    y = swoosh_l(dense(p[f"{prefix}_in"], x, dtype=dt))
    return dense(p[f"{prefix}_out"], y, dtype=dt)


def _conv_module(p, prefix, x, mask, si, cfg: ZipformerConfig):
    dt = cfg.dtype
    y = dense(p[f"{prefix}_in"], x, dtype=dt)
    a, g = jnp.split(y, 2, axis=-1)
    y = a * jax.nn.sigmoid(g)
    y = jnp.where(mask[..., None], y, 0)
    y = depthwise_conv1d(p[f"{prefix}_dw"], y, padding="SAME", dtype=dt)
    y = swoosh_r(y)
    return dense(p[f"{prefix}_out"], y, dtype=dt)


def _attn_context(p, x, pos_emb, si, cfg: ZipformerConfig):
    """Project the SHARED attention inputs once per layer (zipformer2 computes
    q/k/pos-q a single time and reuses them for all three applications)."""
    b, t, d = x.shape
    h, qd, pd = cfg.num_heads[si], cfg.query_head_dim, cfg.pos_head_dim
    dt = cfg.dtype
    qkp = dense(p["attn_qkp"], x, dtype=dt).reshape(b, t, h, 2 * qd + pd)

    def flat(a):  # [B, T, H, c] -> [B*H, T, c]
        return jnp.transpose(a, (0, 2, 1, 3)).reshape(b * h, t, -1)

    q = flat(qkp[..., :qd])
    k = flat(qkp[..., qd : 2 * qd])
    qp = flat(qkp[..., 2 * qd :])
    pos = dense(p["attn_pos"], pos_emb, dtype=dt).reshape(2 * t - 1, h, pd)
    pos = jnp.transpose(pos, (1, 0, 2))  # [H, 2T-1, pd]
    return q, k, qp, pos


def _shared_attn_kernel(t):
    """Single-pass kernel within its VMEM budget, streamed-KV beyond."""
    from ..ops.zipformer_attention import (
        shared_rel_attention,
        shared_rel_attention_blockwise,
    )

    return shared_rel_attention if t <= 2048 else shared_rel_attention_blockwise


def _self_attn_pallas(p, prefix, x, ctx, lengths, si, cfg: ZipformerConfig):
    shared_rel_attention = _shared_attn_kernel(x.shape[1])

    b, t, d = x.shape
    h, vd = cfg.num_heads[si], cfg.value_head_dim
    dt = cfg.dtype
    q, k, qp, pos = ctx
    v = dense(p[f"{prefix}_v"], x, dtype=dt).reshape(b, t, h, vd)
    v = jnp.transpose(v, (0, 2, 1, 3)).reshape(b * h, t, vd)
    out = shared_rel_attention(
        q, k, qp, pos, v, jnp.repeat(lengths, h), heads=h
    )  # [B*H, T, vd] fp32
    out = jnp.transpose(out.reshape(b, h, t, vd), (0, 2, 1, 3)).astype(dt)
    return dense(p[f"{prefix}_out"], out.reshape(b, t, h * vd), dtype=dt)


def _nonlin_attention_pallas(p, x, ctx, lengths, si, cfg: ZipformerConfig):
    shared_rel_attention = _shared_attn_kernel(x.shape[1])

    b, t, d = x.shape
    h = cfg.num_heads[si]
    dt = cfg.dtype
    q, k, qp, pos = ctx
    sxy = dense(p["na_in"], x, dtype=dt)
    s, v, y = jnp.split(sxy, 3, axis=-1)
    v = jnp.tanh(s) * v  # [B, T, hidden]

    def head0(a):  # [B*H, T, c] -> head-0 rows [B, T, c]
        return a.reshape(b, h, t, -1)[:, 0]

    attended = shared_rel_attention(
        head0(q), head0(k), head0(qp), pos[:1], v.astype(dt), lengths, heads=1
    ).astype(dt)
    return dense(p["na_out"], attended * y, dtype=dt)


def _layer(p, x, pos_emb, mask, si, cfg: ZipformerConfig):
    dt = cfg.dtype
    x_orig = x
    t = x.shape[1]

    # scores-in-VMEM kernel (single-pass to 2048 frames, streamed KV blocks
    # beyond — no length cliff); the XLA path serves CPU and training
    use_pallas = cfg.attn_impl == "pallas"
    if use_pallas:
        ctx = _attn_context(p, x.astype(dt), pos_emb, si, cfg)
        lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)
        nonlin = lambda y: _nonlin_attention_pallas(p, y, ctx, lengths, si, cfg)
        attn = lambda pre, y: _self_attn_pallas(p, pre, y, ctx, lengths, si, cfg)
    else:
        weights = _attn_weights(p, x.astype(dt), pos_emb, mask, si, cfg)
        nonlin = lambda y: _nonlin_attention(p, y, weights[:, 0], cfg)
        attn = lambda pre, y: _self_attn(p, pre, y, weights, si, cfg)

    x = x + _ffn(p, "ff1", x.astype(dt), cfg)
    x = x + nonlin(x.astype(dt))
    x = x + attn("sa1", x.astype(dt))
    x = x + _conv_module(p, "cv1", x.astype(dt), mask, si, cfg)
    x = x + _ffn(p, "ff2", x.astype(dt), cfg)
    x = bypass_apply(p["bypass_mid"], x_orig, x)
    x = x + attn("sa2", x.astype(dt))
    x = x + _conv_module(p, "cv2", x.astype(dt), mask, si, cfg)
    x = x + _ffn(p, "ff3", x.astype(dt), cfg)
    x = bias_norm(p["norm"], x)
    x = bypass_apply(p["bypass"], x_orig, x)
    return x


def _downsample(weights, x, lengths, ds):
    """Learned softmax-weighted pooling of frame groups: [B,T,D] -> [B,⌈T/ds⌉,D]."""
    b, t, d = x.shape
    t_out = -(-t // ds)
    pad = t_out * ds - t
    x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="edge")
    w = jax.nn.softmax(weights.astype(jnp.float32))
    x = x.reshape(b, t_out, ds, d)
    x = jnp.einsum("btsd,s->btd", x.astype(jnp.float32), w)
    return x, -(-lengths // ds)


def _upsample(x, t_target, ds):
    """Repeat frames ds times and crop: [B,T,D] -> [B,t_target,D]."""
    x = jnp.repeat(x, ds, axis=1)
    return x[:, :t_target]


def _convert_channels(x, new_dim):
    d = x.shape[-1]
    if new_dim == d:
        return x
    if new_dim < d:
        return x[..., :new_dim]
    return jnp.pad(x, ((0, 0), (0, 0), (0, new_dim - d)))


def zipformer_output_length(n_frames, cfg: ZipformerConfig):
    """Encoder frames produced for ``n_frames`` feature frames — the exact
    host-side mirror of the length arithmetic in :func:`_embed` (three VALID
    convs, middle one strided) followed by the output pair-averaging
    downsample in :func:`zipformer_encode`. Serving lane clocks use this to
    avoid any device readback (same contract as
    fastconformer.encoder_output_length)."""
    e = max((int(n_frames) - 2 - 3) // 2 + 1 - 2, 0)
    return -(-e // cfg.output_downsampling)


def zipformer_encode(params, feats, feat_lengths, cfg: ZipformerConfig):
    """Encode log-mel features.

    Args:
      feats: [B, T, feat_in] float
      feat_lengths: [B] int32

    Returns:
      (encoded [B, T_out, max(encoder_dim)] fp32, lengths [B] int32);
      T_out ≈ T / (2 · output_downsampling) — 0.04 s per frame.
    """
    x, lengths = _embed(params["embed"], feats, feat_lengths, cfg)
    res_dt = jnp.dtype(cfg.residual_dtype)
    x = x.astype(res_dt)
    t1 = x.shape[1]

    stack_outputs = []
    for si, stack in enumerate(params["stacks"]):
        ds = cfg.downsampling[si]
        x = _convert_channels(x, cfg.encoder_dim[si])
        stack_in = x
        if ds > 1:
            x, ds_lengths = _downsample(stack["ds_weights"], x, lengths, ds)
        else:
            ds_lengths = lengths
        t_ds = x.shape[1]
        mask = jnp.arange(t_ds)[None, :] < ds_lengths[:, None]
        pos_emb = _compact_rel_pos(t_ds, cfg.pos_dim)

        def body(carry, layer_params, si=si, pos_emb=pos_emb, mask=mask):
            y = _layer(layer_params, carry, pos_emb, mask, si, cfg)
            y = jnp.where(mask[..., None], y, 0).astype(res_dt)
            return y, None

        x, _ = jax.lax.scan(body, x.astype(res_dt), stack["layers"])
        if ds > 1:
            x = _upsample(x, t1, ds)
            x = bypass_apply(stack["out_bypass"], stack_in, x).astype(res_dt)
        valid = jnp.arange(t1)[None, :] < lengths[:, None]
        x = jnp.where(valid[..., None], x, 0)
        stack_outputs.append(x)

    # assemble the full-dim output from the widest channels available
    # (icefall _get_full_dim_output)
    pieces = [stack_outputs[-1]]
    cur_dim = cfg.encoder_dim[-1]
    for si in range(len(stack_outputs) - 2, -1, -1):
        d = cfg.encoder_dim[si]
        if d > cur_dim:
            pieces.append(stack_outputs[si][..., cur_dim:d])
            cur_dim = d
    out = jnp.concatenate(pieces, axis=-1)

    # output 2x downsample by pair averaging
    ods = cfg.output_downsampling
    if ods > 1:
        b, t, d = out.shape
        t_out = -(-t // ods)
        out = jnp.pad(out, ((0, 0), (0, t_out * ods - t), (0, 0)), mode="edge")
        out = out.reshape(b, t_out, ods, d).mean(axis=2)
        lengths = -(-lengths // ods)

    t_out = out.shape[1]
    valid = jnp.arange(t_out)[None, :] < lengths[:, None]
    out = jnp.where(valid[..., None], out, 0)
    return out.astype(jnp.float32), lengths.astype(jnp.int32)
