"""FastConformer encoder (TPU-native JAX).

First-party replacement for the NeMo FastConformer encoder that the reference
drives through ``EncDecRNNTBPEModel`` (pkg/nemo-asr/src/transcribe.py:26-28,
48-53). Architecture: 2-D depthwise-striding conv subsampling (8×), then N
Conformer blocks (½FFN → rel-pos MHSA → conv module → ½FFN → LN) at 0.08 s
per output frame — the timestamp grid the reference's decode heuristics
assume (pkg/nemo-asr/src/decode.py:5,48).

TPU-first choices:
- identical blocks are stacked and driven by ``lax.scan`` → one compiled
  block body regardless of depth (compile time O(1) in num_layers);
- params live in fp32, matmuls run in a configurable compute dtype (bf16 on
  TPU MXU); layer norms/softmax accumulate in fp32;
- static shapes throughout; per-utterance validity is an int32 length vector
  and masks, so one compiled program serves a whole padded batch bucket;
- relative-position attention keeps the (q+v)·posᵀ term as a dense matmul
  over a 2T-1 sinusoidal table with a gather-free circulant shift.
"""

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    batch_norm_infer,
    batch_norm_init,
    conv1d,
    conv1d_init,
    conv2d,
    conv2d_init,
    dense,
    dense_init,
    depthwise_conv1d,
    depthwise_conv1d_init,
    glu,
    layer_norm,
    layer_norm_init,
    swish,
)

__all__ = ["FastConformerConfig", "init_fastconformer", "fastconformer_encode"]


@dataclass(frozen=True)
class FastConformerConfig:
    feat_in: int = 80
    num_layers: int = 24
    d_model: int = 1024
    num_heads: int = 8
    ff_expansion: int = 4
    conv_kernel: int = 9
    subsampling_factor: int = 8
    subsampling_channels: int = 256
    # "dw_striding": NeMo FastConformer depthwise-striding (SAME padding);
    # "conv2d": ESPnet Conv2dSubsampling (VALID padding, full convs)
    subsampling_style: str = "dw_striding"
    conv_norm: str = "batch_norm"  # batch_norm (inference stats) | layer_norm
    xscaling: bool = True
    # encoder-level LayerNorm after the block stack (ESPnet `after_norm`
    # with normalize_before; NeMo has no encoder-level norm)
    final_norm: bool = False
    compute_dtype: str = "bfloat16"
    # attention implementation: "xla" (einsum + pad/reshape shift) or
    # "pallas" (VMEM-resident fused kernel, ops/relpos_attention.py)
    attn_impl: str = "xla"
    # conv module implementation: "xla" or "pallas"
    # (ops/conformer_conv.py: whole module fused, time axis VMEM-resident)
    conv_impl: str = "xla"
    # pre-sub-block LayerNorm placement: "xla" (separate reduce+normalize
    # fusions; the normalized [B,T,D] round-trips HBM in fp32 at every site)
    # or "pallas" (ops/ln_dense.py: LN computed in VMEM inside the following
    # projection — FFN-in with fused swish, one packed qkv emitting the
    # attention kernel's 128-aligned layout, conv module in-kernel)
    lnd_impl: str = "xla"
    # dtype of the residual stream BETWEEN blocks; bf16 halves the
    # elementwise/HBM traffic of the norm/residual chain at some numeric risk
    residual_dtype: str = "float32"
    # rematerialize each block's activations in the backward pass (training
    # memory ∝ sqrt(depth) instead of depth)
    remat: bool = False
    # sequence parallelism: when set to a mesh axis name, the residual
    # stream's TIME axis is sharding-constrained to that axis between blocks
    # and XLA's SPMD partitioner inserts the collectives (K/V all-gathers
    # for attention, halo exchanges for the depthwise convs) — the
    # scaling-book recipe: annotate, let XLA place collectives on ICI.
    # Requires the XLA impls (Pallas calls are opaque to the partitioner);
    # use parallel.sequence.sequence_parallel_encode, which pins them.
    seq_axis: Optional[str] = None

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def head_dim(self):
        return self.d_model // self.num_heads

    @staticmethod
    def xlarge(**overrides) -> "FastConformerConfig":
        """~600M-encoder configuration matching the published
        reazonspeech-nemo-v2 (619M total with decoder/joint)."""
        return FastConformerConfig(**overrides)

    @staticmethod
    def tiny(**overrides) -> "FastConformerConfig":
        cfg = dict(num_layers=2, d_model=64, num_heads=4, subsampling_channels=32)
        cfg.update(overrides)
        return FastConformerConfig(**cfg)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_block(key, cfg: FastConformerConfig):
    d, dff = cfg.d_model, cfg.d_model * cfg.ff_expansion
    keys = iter(jax.random.split(key, 16))
    p = {
        "ffn1_ln": layer_norm_init(d),
        "ffn1_in": dense_init(next(keys), d, dff),
        "ffn1_out": dense_init(next(keys), dff, d),
        "attn_ln": layer_norm_init(d),
        "attn_q": dense_init(next(keys), d, d),
        "attn_k": dense_init(next(keys), d, d),
        "attn_v": dense_init(next(keys), d, d),
        "attn_pos": dense_init(next(keys), d, d, bias=False),
        "attn_out": dense_init(next(keys), d, d),
        "attn_bias_u": jnp.zeros((cfg.num_heads, cfg.head_dim)),
        "attn_bias_v": jnp.zeros((cfg.num_heads, cfg.head_dim)),
        "conv_ln": layer_norm_init(d),
        "conv_in": conv1d_init(next(keys), d, 2 * d, 1),
        "conv_dw": depthwise_conv1d_init(next(keys), d, cfg.conv_kernel),
        "conv_out": conv1d_init(next(keys), d, d, 1),
        "ffn2_ln": layer_norm_init(d),
        "ffn2_in": dense_init(next(keys), d, dff),
        "ffn2_out": dense_init(next(keys), dff, d),
        "final_ln": layer_norm_init(d),
    }
    if cfg.conv_norm == "batch_norm":
        p["conv_bn"] = batch_norm_init(d)
    else:
        p["conv_bn"] = layer_norm_init(d)
    return p


def encoder_output_length(n_frames, cfg: "FastConformerConfig"):
    """Encoder frames produced for ``n_frames`` feature frames — the exact
    host-side mirror of the length arithmetic in :func:`_subsample` (serving
    schedulers track per-lane frame clocks without a device readback)."""
    return _sub_out_dim(
        n_frames, int(np.log2(cfg.subsampling_factor)), cfg.subsampling_style
    )


def _sub_out_dim(n, stages, style="dw_striding"):
    for _ in range(stages):
        if style == "conv2d":
            n = (n - 1) // 2  # VALID k=3 s=2
        else:
            n = (n - 1) // 2 + 1  # SAME k=3 s=2 (pad 1)
    return n


def init_fastconformer(key, cfg: FastConformerConfig):
    stages = int(np.log2(cfg.subsampling_factor))
    c = cfg.subsampling_channels
    keys = iter(jax.random.split(key, 8 + cfg.num_layers))

    if cfg.subsampling_style == "conv2d":
        sub = {"conv0": conv2d_init(next(keys), 1, c, 3)}
        for i in range(1, stages):
            sub[f"conv{i}"] = conv2d_init(next(keys), c, c, 3)
    else:
        sub = {"conv0": conv2d_init(next(keys), 1, c, 3)}
        for i in range(1, stages):
            sub[f"dw{i}"] = conv2d_init(next(keys), c, c, 3, groups=c)
            sub[f"pw{i}"] = conv2d_init(next(keys), c, c, 1)
    f_out = _sub_out_dim(cfg.feat_in, stages, cfg.subsampling_style)
    sub["proj"] = dense_init(next(keys), c * f_out, cfg.d_model)

    blocks = [_init_block(next(keys), cfg) for _ in range(cfg.num_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    tree = {"subsampling": sub, "blocks": stacked}
    if cfg.final_norm:
        tree["after_norm"] = layer_norm_init(cfg.d_model)
    return tree


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _subsample(p, feats, lengths, cfg: FastConformerConfig):
    """[B, T, F] -> [B, T/factor, d_model] conv subsampling stack."""
    stages = int(np.log2(cfg.subsampling_factor))
    dt = cfg.dtype
    x = feats[..., None].astype(dt)  # [B, T, F, 1]
    c = cfg.subsampling_channels
    if cfg.subsampling_style == "conv2d":
        x = jax.nn.relu(conv2d(p["conv0"], x, stride=2, padding="VALID", dtype=dt))
        for i in range(1, stages):
            x = jax.nn.relu(
                conv2d(p[f"conv{i}"], x, stride=2, padding="VALID", dtype=dt)
            )
        for _ in range(stages):
            lengths = (lengths - 1) // 2
    else:
        pad = [(1, 1), (1, 1)]
        x = jax.nn.relu(conv2d(p["conv0"], x, stride=2, padding=pad, dtype=dt))
        for i in range(1, stages):
            x = conv2d(p[f"dw{i}"], x, stride=2, padding=pad, groups=c, dtype=dt)
            x = jax.nn.relu(
                conv2d(p[f"pw{i}"], x, stride=1, padding="VALID", dtype=dt)
            )
        for _ in range(stages):
            lengths = (lengths - 1) // 2 + 1
    b, t, f, ch = x.shape
    x = x.reshape(b, t, f * ch)
    x = dense(p["proj"], x, dtype=dt)
    return x, lengths


def _sinusoid_rel_pos(t, d_model):
    """Relative sinusoidal table for offsets [t-1 ... -(t-1)]: [2t-1, d]."""
    pos = np.arange(t - 1, -t, -1, dtype=np.float64)
    inv = np.exp(-np.arange(0, d_model, 2, dtype=np.float64) * (np.log(10000.0) / d_model))
    ang = pos[:, None] * inv[None, :]
    pe = np.zeros((2 * t - 1, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return jnp.asarray(pe)


def _rel_shift(x):
    """Transformer-XL relative shift, [B, H, T, 2T-1] -> [B, H, T, T].

    Input column l holds the score for relative offset (T-1-l); query row t
    and key column j need offset t-j, so out[..., t, j] = x[..., t, T-1-t+j].
    Implemented as the standard pad/reshape/slice trick (no gathers)."""
    b, h, t, l = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))  # [B,H,T,2T]
    x = x.reshape(b, h, 2 * t, t)
    x = x[:, :, 1:].reshape(b, h, t, 2 * t - 1)
    return x[..., :t]


def _packed_attn_ok(cfg: FastConformerConfig, t):
    """Gate for the ln_dense-packed-qkv attention path (serving shapes)."""
    from ..ops.ln_dense import ln_dense_supported
    from ..ops.relpos_attention import fused_supported

    d = cfg.d_model
    return (
        cfg.attn_impl == "pallas"
        and cfg.lnd_impl == "pallas"
        and fused_supported(t, cfg.num_heads, cfg.head_dim)
        and ln_dense_supported(d, 3 * d, jnp.dtype(cfg.dtype).itemsize)
    )


def _mhsa_relpos(p, x_raw, pos_emb, mask, cfg: FastConformerConfig,
                 delta=None, delta_scale=0.5):
    """Relative-position multi-head attention (Transformer-XL form).

    x_raw: [B, T, D] residual stream BEFORE the pre-attention LayerNorm
    (applied here so the ln_dense path can fuse it), pos_emb: [2T'-1, D]
    where T' is T or its 128-aligned pad (packed path), mask: [B, T]
    validity. Returns [B, T, D].

    ``delta``: optional preceding-branch output (the ffn1 delta). On the
    packed path the residual add ``x_raw + delta_scale·delta`` fuses into the
    qkv kernel (ops/ln_dense.ln_dense_add) and the summed stream is returned
    as a second output: ``(attn_out, stream)``. Requires T % 128 == 0 (the
    stream leaves the kernel at the attention-aligned T).
    """
    b, t, d = x_raw.shape
    h, dh = cfg.num_heads, cfg.head_dim
    dt = cfg.dtype

    # ln_dense fast path: LayerNorm fused into ONE packed qkv projection that
    # emits the attention kernel's 128-aligned [B, T', 3D] layout directly —
    # the normalized tensor, the three separate projections, and the
    # alignment pads never touch HBM.
    if _packed_attn_ok(cfg, t):
        from ..ops.ln_dense import ln_dense_add_diff, ln_dense_diff
        from ..ops.relpos_attention import relpos_attention_fused_packed_diff

        # the table length encodes the T the attention internals run at
        t_pad = (pos_emb.shape[0] + 1) // 2
        if t_pad >= t and (delta is None or t_pad == t):
            # three weight segments share one LN pass and pack along the
            # output lane axis in-kernel — no concatenated weight copy
            w_qkv = tuple(p[k]["w"].astype(dt)
                          for k in ("attn_q", "attn_k", "attn_v"))
            c_qkv = tuple(p[k]["b"] for k in ("attn_q", "attn_k", "attn_v"))
            stream = None
            if delta is None:
                qkv = ln_dense_diff(x_raw, p["attn_ln"]["scale"],
                                    p["attn_ln"]["bias"], w_qkv, c_qkv, None,
                                    t_pad if t_pad != t else None)
            else:
                qkv, stream = ln_dense_add_diff(
                    x_raw, delta, p["attn_ln"]["scale"],
                    p["attn_ln"]["bias"], w_qkv, c_qkv, delta_scale)
            pos = dense(p["attn_pos"], pos_emb, dtype=dt).reshape(-1, h, dh)
            lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)
            out = relpos_attention_fused_packed_diff(
                qkv, pos, p["attn_bias_u"], p["attn_bias_v"], lengths, h)
            attn_out = dense(p["attn_out"], out[:, :t], dtype=dt)
            return attn_out if delta is None else (attn_out, stream)

    if delta is not None:
        # fusion unavailable at this shape: do the add in XLA, same contract
        stream = x_raw + delta_scale * delta.astype(x_raw.dtype)
        return _mhsa_relpos(p, stream, pos_emb, mask, cfg), stream

    x = layer_norm(p["attn_ln"], x_raw).astype(dt)

    # Serving-shape fast path: the layout-fused kernel reads q/k/v exactly as
    # the denses produce them ([B, T, D]) and adds the u/v biases in-kernel —
    # no [B, H, T, dh] transposes or full-tensor bias adds touch HBM. Falls
    # through to the generic path for long-form T or odd head dims.
    if cfg.attn_impl == "pallas":
        from ..ops.relpos_attention import (
            fused_supported,
            relpos_attention_fused_diff,
        )

        if fused_supported(t, h, dh):
            q3 = dense(p["attn_q"], x, dtype=dt)
            k3 = dense(p["attn_k"], x, dtype=dt)
            v3 = dense(p["attn_v"], x, dtype=dt)
            pos = dense(p["attn_pos"], pos_emb, dtype=dt).reshape(-1, h, dh)
            lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)
            out = relpos_attention_fused_diff(
                q3, k3, v3, pos, p["attn_bias_u"], p["attn_bias_v"],
                lengths, h,
            )  # [B, T, D] in dt
            return dense(p["attn_out"], out, dtype=dt)

    q = dense(p["attn_q"], x, dtype=dt).reshape(b, t, h, dh)
    k = dense(p["attn_k"], x, dtype=dt).reshape(b, t, h, dh)
    v = dense(p["attn_v"], x, dtype=dt).reshape(b, t, h, dh)
    pos = dense(p["attn_pos"], pos_emb, dtype=dt).reshape(-1, h, dh)  # [2T-1,H,dh]

    qu = q + p["attn_bias_u"].astype(dt)
    qv = q + p["attn_bias_v"].astype(dt)

    # Single-pass kernel up to ~1k frames (k/v/pos + a [BQ, 2T-1] score tile
    # fit in VMEM); beyond that (long-form unchunked audio) the blockwise-KV
    # variant streams key/value blocks with an online softmax — no T cap.
    # The wrapper is differentiable (custom VJP: kernel forward, the XLA
    # formulation's autodiff backward), so training can keep attn_impl=pallas.
    if cfg.attn_impl == "pallas":
        from ..ops.relpos_attention import relpos_attention_diff

        lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)
        # inputs stay in the compute dtype (bf16 on TPU — half the VMEM
        # traffic and MXU-native); the kernel accumulates scores/softmax/PV
        # in fp32 (preferred_element_type), so numerics match bf16 einsums
        out = relpos_attention_diff(
            jnp.transpose(qu, (0, 2, 1, 3)),
            jnp.transpose(qv, (0, 2, 1, 3)),
            jnp.transpose(k, (0, 2, 1, 3)),
            jnp.transpose(v, (0, 2, 1, 3)),
            pos,
            lengths,
        )  # [B, H, T, dh] fp32
        out = jnp.transpose(out, (0, 2, 1, 3)).astype(dt).reshape(b, t, d)
        return dense(p["attn_out"], out, dtype=dt)

    # content score [B,H,T,T]; fp32 accumulation
    ac = jnp.einsum("bthd,bshd->bhts", qu, k, preferred_element_type=jnp.float32)
    # position score [B,H,T,2T-1] -> shifted [B,H,T,T]
    bd = jnp.einsum("bthd,lhd->bhtl", qv, pos, preferred_element_type=jnp.float32)
    bd = _rel_shift(bd)

    scores = (ac + bd) / np.sqrt(dh)
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask[:, None, None, :], scores, neg)
    probs = jax.nn.softmax(scores, axis=-1).astype(dt)

    out = jnp.einsum("bhts,bshd->bthd", probs, v, preferred_element_type=jnp.float32)
    out = out.astype(dt).reshape(b, t, d)
    return dense(p["attn_out"], out, dtype=dt)


def _conv_module(p, x_raw, mask, cfg: FastConformerConfig):
    """Conformer conv module: LN -> pointwise(2d)+GLU -> depthwise(k) ->
    norm -> swish -> pointwise. Padded frames are zeroed before the depthwise
    conv so padding never leaks into valid frames. ``x_raw`` is the residual
    stream BEFORE the pre-module LayerNorm (applied here, in-kernel on the
    lnd_impl="pallas" path)."""
    dt = cfg.dtype
    b, t, d = x_raw.shape
    # the fused kernel holds the whole input tile + [T, 2D] GLU buffer in
    # VMEM per grid step; the budget is in BYTES because the lnd_impl=pallas
    # path feeds the fp32 residual (4 B/elem) where the plain path feeds the
    # compute dtype (2 B at bf16) — beyond ~2 MB of input tile the kernel
    # overflows, so long-form utterances take the XLA path (same pattern as
    # the attention kernel). The gate is byte-based: per element the kernel
    # holds the input tile (x dtype — fp32 on the lnd_impl=pallas path, the
    # compute dtype otherwise), the [T, 2D] fp32 GLU buffer (8 B) and the
    # output tile (2 B); the budget equals the previously hardware-validated
    # 512K-element bf16 ceiling, so fp32 inputs get a proportionally lower
    # element cap (~448K; the B=128 serving shape at 393K stays fused).
    x_bytes = 4 if cfg.lnd_impl == "pallas" else jnp.dtype(dt).itemsize
    if cfg.conv_impl == "pallas" and t * d * (x_bytes + 10) <= 512 * 1024 * 12:
        from ..ops.conformer_conv import fold_batch_norm, fused_conv_module

        lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)
        if cfg.conv_norm == "batch_norm":
            scale, bias = fold_batch_norm(p["conv_bn"])
            norm = "folded"
        else:
            scale, bias = p["conv_bn"]["scale"], p["conv_bn"]["bias"]
            norm = "layer"
        if cfg.lnd_impl == "pallas":
            return fused_conv_module(
                x_raw, lengths,
                p["conv_in"]["w"][0], p["conv_in"]["b"],
                p["conv_dw"]["w"], p["conv_dw"]["b"],
                scale, bias,
                p["conv_out"]["w"][0], p["conv_out"]["b"],
                norm=norm,
                ln_scale=p["conv_ln"]["scale"], ln_bias=p["conv_ln"]["bias"],
                compute_dtype=dt,
            )
        return fused_conv_module(
            layer_norm(p["conv_ln"], x_raw).astype(dt), lengths,
            p["conv_in"]["w"][0], p["conv_in"]["b"],
            p["conv_dw"]["w"], p["conv_dw"]["b"],
            scale, bias,
            p["conv_out"]["w"][0], p["conv_out"]["b"],
            norm=norm,
        )
    x = layer_norm(p["conv_ln"], x_raw).astype(dt)
    x = conv1d(p["conv_in"], x, dtype=dt)
    x = glu(x, axis=-1)
    x = jnp.where(mask[..., None], x, 0)
    x = depthwise_conv1d(p["conv_dw"], x, padding="SAME", dtype=dt)
    if cfg.conv_norm == "batch_norm":
        x = batch_norm_infer(p["conv_bn"], x).astype(dt)
    else:
        x = layer_norm(p["conv_bn"], x)
    x = swish(x)
    return conv1d(p["conv_out"], x, dtype=dt)


def _residual_fusion_ok(cfg: FastConformerConfig, t):
    """Gate for the fused-residual block tail: the packed attention path must
    be active at an unpadded T (the fused stream leaves the qkv kernel at
    the attention-aligned length) — the serving bucket shapes."""
    return cfg.lnd_impl == "pallas" and t % 128 == 0 and _packed_attn_ok(cfg, t)


def _block(p, x, pos_emb, mask, lengths, cfg: FastConformerConfig):
    """One Conformer block; returns the masked next-layer stream in
    cfg.residual_dtype.

    On the Pallas serving path the residual elementwise chain is fused into
    kernels (VERDICT r2 item 6): the ffn1 add rides the qkv ln_dense
    (ln_dense_add), and the ffn2 add + final LayerNorm + valid-length
    masking collapse into ONE pass (ops/ln_dense.add_ln) — the fp32 stream
    crosses HBM once per site instead of three times.
    """
    res_dt = jnp.dtype(cfg.residual_dtype)
    t = x.shape[1]
    if _residual_fusion_ok(cfg, t):
        from ..ops.ln_dense import add_ln_diff

        y1 = _ffn(p, "ffn1", x, cfg)
        attn_y, r1 = _mhsa_relpos(p, x, pos_emb, mask, cfg, delta=y1)
        r2 = r1 + attn_y.astype(r1.dtype)
        r3 = r2 + _conv_module(p, r2, mask, cfg).astype(r1.dtype)
        y3 = _ffn(p, "ffn2", r3, cfg)
        return add_ln_diff(r3, y3, lengths, p["final_ln"]["scale"],
                           p["final_ln"]["bias"], 0.5, 1e-5,
                           cfg.residual_dtype)

    x = x + 0.5 * _ffn(p, "ffn1", x, cfg)
    x = x + _mhsa_relpos(p, x, pos_emb, mask, cfg)
    x = x + _conv_module(p, x, mask, cfg)
    x = x + 0.5 * _ffn(p, "ffn2", x, cfg)
    y = layer_norm(p["final_ln"], x)
    return jnp.where(mask[..., None], y, 0).astype(res_dt)


def _ffn(p, name, x, cfg: FastConformerConfig):
    dt = cfg.dtype
    if cfg.lnd_impl == "pallas":
        from ..ops.ln_dense import ln_dense_diff, ln_dense_supported

        dff = cfg.d_model * cfg.ff_expansion
        if ln_dense_supported(cfg.d_model, dff, jnp.dtype(dt).itemsize):
            y = ln_dense_diff(x, p[f"{name}_ln"]["scale"],
                              p[f"{name}_ln"]["bias"],
                              p[f"{name}_in"]["w"].astype(dt),
                              p[f"{name}_in"]["b"], "swish", None)
            return dense(p[f"{name}_out"], y, dtype=dt)
    y = layer_norm(p[f"{name}_ln"], x).astype(dt)
    y = swish(dense(p[f"{name}_in"], y, dtype=dt))
    return dense(p[f"{name}_out"], y, dtype=dt)


def _encode_prologue(params, feats, feat_lengths, cfg: FastConformerConfig):
    """Front half of :func:`fastconformer_encode` (subsample → xscale →
    alignment pad → rel-pos table → mask → residual-dtype cast), shared with
    ``parallel.pipeline``, which runs the block stack under a GPipe schedule
    instead of the local ``lax.scan``.

    Returns ``(x, lengths, pos_emb, mask, t_out)`` where ``x`` is the
    residual stream entering block 0 and ``t_out`` the unpadded frame count
    the epilogue slices back to.
    """
    x, lengths = _subsample(params["subsampling"], feats, feat_lengths, cfg)
    b, t, d = x.shape
    if cfg.xscaling:
        x = x * np.sqrt(cfg.d_model).astype(np.float32)

    # the packed ln_dense+attention path runs the attention internals at the
    # 128-aligned T; the table is offset-indexed, so building it at the
    # padded length only widens it (same values at every used offset)
    t_att = -(-t // 128) * 128 if _packed_attn_ok(cfg, t) else t
    # On the full-Pallas stack, hoist the alignment pad onto the stream
    # itself so the fused-residual block tail (_residual_fusion_ok) stays
    # active at ANY serving T: every sub-block is a Pallas kernel with
    # in-kernel length masking, so — unlike the round-2 naive hoist, where
    # XLA merged the then-XLA FFN matmuls into slow scan-wide loop fusions —
    # no XLA matmul sees the padded T. The final slice restores T.
    t_out = t
    if t_att != t and cfg.conv_impl == "pallas" \
            and _residual_fusion_ok(cfg, t_att):
        x = jnp.pad(x, ((0, 0), (0, t_att - t), (0, 0)))
        t = t_att
    pos_emb = _sinusoid_rel_pos(t_att, cfg.d_model)
    mask = jnp.arange(t)[None, :] < lengths[:, None]  # [B, T']
    res_dt = jnp.dtype(cfg.residual_dtype)
    x = jnp.where(mask[..., None], x, 0).astype(res_dt)
    return x, lengths, pos_emb, mask, t_out


def fastconformer_encode(params, feats, feat_lengths, cfg: FastConformerConfig):
    """Encode log-mel features.

    Args:
      params: tree from init_fastconformer
      feats: [B, T, feat_in] float
      feat_lengths: [B] int32
      cfg: FastConformerConfig

    Returns:
      (encoded [B, T', d_model] fp32, encoded_lengths [B] int32)
      where T' = T / subsampling_factor (0.08 s per frame at 10 ms hop).
    """
    x, lengths, pos_emb, mask, t_out = _encode_prologue(
        params, feats, feat_lengths, cfg)

    if cfg.seq_axis:
        if "pallas" in (cfg.attn_impl, cfg.conv_impl, cfg.lnd_impl):
            # a pallas_call is an opaque custom call GSPMD can't partition:
            # honoring seq_axis here would silently force replication/gathers
            # instead of the intended time sharding
            raise ValueError(
                "seq_axis requires the XLA impls (attn_impl/conv_impl/"
                "lnd_impl='xla'); use parallel.sequence."
                "sequence_parallel_config/sequence_parallel_encode"
            )
        from jax.sharding import PartitionSpec

        seq_spec = PartitionSpec(None, cfg.seq_axis, None)
        x = jax.lax.with_sharding_constraint(x, seq_spec)

    def body(carry, layer_params):
        # masking/res-dtype handled inside _block (fused on the Pallas path)
        out = _block(layer_params, carry, pos_emb, mask, lengths, cfg)
        if cfg.seq_axis:
            # re-pin the time sharding each block so the partitioner keeps
            # the stream distributed instead of settling on replication
            out = jax.lax.with_sharding_constraint(out, seq_spec)
        return out, None

    if cfg.remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = x[:, :t_out]
    if cfg.final_norm:
        x = layer_norm(params["after_norm"], x)
    return x.astype(jnp.float32), lengths
