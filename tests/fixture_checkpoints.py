"""Builders for REALISTIC published-checkpoint containers.

Round 1 exercised the converters only on in-memory synthetic torch modules.
These helpers construct the actual on-disk container formats the published
models ship in — a ``.nemo`` tar archive, an espnet-zoo ``exp/`` directory
with config.yaml + .pth, a sherpa-style k2 repo (tokens.txt + decoder/joiner
ONNX graphs + icefall .pt) — and HF-hub cache snapshot layouts around them,
so the loaders' full resolve→convert→cache→serve path runs in CI exactly as
it would against the real downloads (which need egress this environment
doesn't have).

Weights are random but the FORMATS are faithful: tarfile layout per
read_nemo_tar (model_config.yaml + model_weights.ckpt + tokenizer .model),
espnet-zoo directory layout per Speech2Text.from_pretrained, ONNX protobuf
wire format per convert/onnx_reader.py, k2 tokens.txt per
pkg/k2-asr/src/huggingface.py:42.
"""

import io
import os
import tarfile

import numpy as np
import torch

RNG = np.random.default_rng(20260816)


def rt(*shape):
    return torch.from_numpy((RNG.standard_normal(shape) * 0.1).astype(np.float32))


# ---------------------------------------------------------------------------
# synthetic state dicts (exact published-module naming)
# ---------------------------------------------------------------------------


def synth_nemo_state_dict(enc_cfg, rnnt_cfg):
    """Random tensors with NeMo EncDecRNNTBPEModel naming."""
    d, dff = enc_cfg.d_model, enc_cfg.d_model * enc_cfg.ff_expansion
    c = enc_cfg.subsampling_channels
    h, dh = enc_cfg.num_heads, enc_cfg.head_dim
    sd = {}

    def add(name, *shape):
        sd[name] = rt(*shape)

    add("encoder.pre_encode.conv.0.weight", c, 1, 3, 3)
    add("encoder.pre_encode.conv.0.bias", c)
    idx = 2
    for i in range(1, 3):
        add(f"encoder.pre_encode.conv.{idx}.weight", c, 1, 3, 3)
        add(f"encoder.pre_encode.conv.{idx}.bias", c)
        add(f"encoder.pre_encode.conv.{idx+1}.weight", c, c, 1, 1)
        add(f"encoder.pre_encode.conv.{idx+1}.bias", c)
        idx += 3
    f_out = enc_cfg.feat_in
    for _ in range(3):
        f_out = (f_out - 1) // 2 + 1
    add("encoder.pre_encode.out.weight", d, c * f_out)
    add("encoder.pre_encode.out.bias", d)

    for n in range(enc_cfg.num_layers):
        p = f"encoder.layers.{n}"
        for ln in ("norm_feed_forward1", "norm_self_att", "norm_conv",
                   "norm_feed_forward2", "norm_out"):
            add(f"{p}.{ln}.weight", d)
            add(f"{p}.{ln}.bias", d)
        for ff in ("feed_forward1", "feed_forward2"):
            add(f"{p}.{ff}.linear1.weight", dff, d)
            add(f"{p}.{ff}.linear1.bias", dff)
            add(f"{p}.{ff}.linear2.weight", d, dff)
            add(f"{p}.{ff}.linear2.bias", d)
        for qkv in ("linear_q", "linear_k", "linear_v", "linear_out"):
            add(f"{p}.self_attn.{qkv}.weight", d, d)
            add(f"{p}.self_attn.{qkv}.bias", d)
        add(f"{p}.self_attn.linear_pos.weight", d, d)
        add(f"{p}.self_attn.pos_bias_u", h, dh)
        add(f"{p}.self_attn.pos_bias_v", h, dh)
        add(f"{p}.conv.pointwise_conv1.weight", 2 * d, d, 1)
        add(f"{p}.conv.pointwise_conv1.bias", 2 * d)
        add(f"{p}.conv.depthwise_conv.weight", d, 1, enc_cfg.conv_kernel)
        add(f"{p}.conv.depthwise_conv.bias", d)
        for bn in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{p}.conv.batch_norm.{bn}"] = (
                rt(d).abs() + 0.5 if bn == "running_var" else rt(d)
            )
        add(f"{p}.conv.pointwise_conv2.weight", d, d, 1)
        add(f"{p}.conv.pointwise_conv2.bias", d)

    add("decoder.prediction.embed.weight", rnnt_cfg.vocab_size, rnnt_cfg.pred_hidden)
    for k in range(rnnt_cfg.pred_rnn_layers):
        add(f"decoder.prediction.dec_rnn.lstm.weight_ih_l{k}",
            4 * rnnt_cfg.pred_hidden, rnnt_cfg.pred_hidden)
        add(f"decoder.prediction.dec_rnn.lstm.weight_hh_l{k}",
            4 * rnnt_cfg.pred_hidden, rnnt_cfg.pred_hidden)
        add(f"decoder.prediction.dec_rnn.lstm.bias_ih_l{k}", 4 * rnnt_cfg.pred_hidden)
        add(f"decoder.prediction.dec_rnn.lstm.bias_hh_l{k}", 4 * rnnt_cfg.pred_hidden)
    add("joint.enc.weight", rnnt_cfg.joint_hidden, rnnt_cfg.enc_dim)
    add("joint.enc.bias", rnnt_cfg.joint_hidden)
    add("joint.pred.weight", rnnt_cfg.joint_hidden, rnnt_cfg.pred_hidden)
    add("joint.pred.bias", rnnt_cfg.joint_hidden)
    add("joint.joint_net.2.weight", rnnt_cfg.num_classes, rnnt_cfg.joint_hidden)
    add("joint.joint_net.2.bias", rnnt_cfg.num_classes)
    return sd


def synth_espnet_state_dict(enc_cfg, num_tokens, rnnt_cfg=None):
    """Random tensors with espnet2 ESPnetASRModel naming (conformer encoder +
    CTC head, optional transducer decoder/joint_network)."""
    d, dff, c = enc_cfg.d_model, enc_cfg.d_model * enc_cfg.ff_expansion, enc_cfg.subsampling_channels
    h, dh = enc_cfg.num_heads, enc_cfg.head_dim
    sd = {}

    def add(name, *shape):
        sd[name] = rt(*shape)

    add("encoder.embed.conv.0.weight", c, 1, 3, 3)
    add("encoder.embed.conv.0.bias", c)
    add("encoder.embed.conv.2.weight", c, c, 3, 3)
    add("encoder.embed.conv.2.bias", c)
    f = enc_cfg.feat_in
    f = (f - 1) // 2
    f = (f - 1) // 2
    add("encoder.embed.out.0.weight", d, c * f)
    add("encoder.embed.out.0.bias", d)
    for n in range(enc_cfg.num_layers):
        p = f"encoder.encoders.{n}"
        for ln in ("norm_ff_macaron", "norm_mha", "norm_conv", "norm_ff", "norm_final"):
            add(f"{p}.{ln}.weight", d)
            add(f"{p}.{ln}.bias", d)
        for ff in ("feed_forward_macaron", "feed_forward"):
            add(f"{p}.{ff}.w_1.weight", dff, d)
            add(f"{p}.{ff}.w_1.bias", dff)
            add(f"{p}.{ff}.w_2.weight", d, dff)
            add(f"{p}.{ff}.w_2.bias", d)
        for qkv in ("linear_q", "linear_k", "linear_v", "linear_out"):
            add(f"{p}.self_attn.{qkv}.weight", d, d)
            add(f"{p}.self_attn.{qkv}.bias", d)
        add(f"{p}.self_attn.linear_pos.weight", d, d)
        add(f"{p}.self_attn.pos_bias_u", h, dh)
        add(f"{p}.self_attn.pos_bias_v", h, dh)
        add(f"{p}.conv_module.pointwise_conv1.weight", 2 * d, d, 1)
        add(f"{p}.conv_module.pointwise_conv1.bias", 2 * d)
        add(f"{p}.conv_module.depthwise_conv.weight", d, 1, enc_cfg.conv_kernel)
        add(f"{p}.conv_module.depthwise_conv.bias", d)
        add(f"{p}.conv_module.norm.weight", d)
        add(f"{p}.conv_module.norm.bias", d)
        add(f"{p}.conv_module.pointwise_conv2.weight", d, d, 1)
        add(f"{p}.conv_module.pointwise_conv2.bias", d)
    add("encoder.after_norm.weight", d)
    add("encoder.after_norm.bias", d)
    add("ctc.ctc_lo.weight", num_tokens, d)
    add("ctc.ctc_lo.bias", num_tokens)

    if rnnt_cfg is not None:
        dd, jd = rnnt_cfg.pred_hidden, rnnt_cfg.joint_hidden
        add("decoder.embed.weight", num_tokens, dd)
        for i in range(rnnt_cfg.pred_rnn_layers):
            in_dim = dd
            add(f"decoder.decoder.{i}.weight_ih_l0", 4 * dd, in_dim)
            add(f"decoder.decoder.{i}.weight_hh_l0", 4 * dd, dd)
            add(f"decoder.decoder.{i}.bias_ih_l0", 4 * dd)
            add(f"decoder.decoder.{i}.bias_hh_l0", 4 * dd)
        add("joint_network.lin_enc.weight", jd, rnnt_cfg.enc_dim)
        add("joint_network.lin_enc.bias", jd)
        add("joint_network.lin_dec.weight", jd, dd)
        add("joint_network.lin_dec.bias", jd)
        add("joint_network.lin_out.weight", num_tokens, jd)
        add("joint_network.lin_out.bias", num_tokens)
    return sd


def synth_icefall_state_dict(enc_cfg, rnnt_cfg):
    """Random tensors with the documented icefall zipformer2 naming."""
    sd = {}

    def add(name, *shape):
        sd[name] = rt(*shape)

    c1, c2, c3 = enc_cfg.embed_channels
    add("encoder_embed.conv.0.weight", c1, 1, 3, 3)
    add("encoder_embed.conv.0.bias", c1)
    add("encoder_embed.conv.4.weight", c2, c1, 3, 3)
    add("encoder_embed.conv.4.bias", c2)
    add("encoder_embed.conv.8.weight", c3, c2, 3, 3)
    add("encoder_embed.conv.8.bias", c3)
    f = enc_cfg.feat_in
    f = (f - 3) // 2 + 1
    f = (f - 3) // 2 + 1
    f = f - 2
    add("encoder_embed.out.weight", enc_cfg.encoder_dim[0], c3 * f)
    add("encoder_embed.out.bias", enc_cfg.encoder_dim[0])
    add("encoder_embed.out_norm.bias", enc_cfg.encoder_dim[0])
    sd["encoder_embed.out_norm.log_scale"] = torch.zeros(())

    qd, vd, pd = enc_cfg.query_head_dim, enc_cfg.value_head_dim, enc_cfg.pos_head_dim
    for s in range(len(enc_cfg.num_layers)):
        d = enc_cfg.encoder_dim[s]
        h = enc_cfg.num_heads[s]
        ffn = enc_cfg.ffn_dim[s]
        hidden = d * 3 // 4
        base = (
            f"encoder.encoders.{s}.encoder.layers"
            if enc_cfg.downsampling[s] > 1
            else f"encoder.encoders.{s}.layers"
        )
        for j in range(enc_cfg.num_layers[s]):
            p = f"{base}.{j}"
            add(f"{p}.self_attn_weights.in_proj.weight", h * (2 * qd + pd), d)
            add(f"{p}.self_attn_weights.in_proj.bias", h * (2 * qd + pd))
            add(f"{p}.self_attn_weights.linear_pos.weight", h * pd, enc_cfg.pos_dim)
            for sa in ("self_attn1", "self_attn2"):
                add(f"{p}.{sa}.in_proj.weight", h * vd, d)
                add(f"{p}.{sa}.in_proj.bias", h * vd)
                add(f"{p}.{sa}.out_proj.weight", d, h * vd)
                add(f"{p}.{sa}.out_proj.bias", d)
            add(f"{p}.nonlin_attention.in_proj.weight", 3 * hidden, d)
            add(f"{p}.nonlin_attention.in_proj.bias", 3 * hidden)
            add(f"{p}.nonlin_attention.out_proj.weight", d, hidden)
            add(f"{p}.nonlin_attention.out_proj.bias", d)
            for ff in ("feed_forward1", "feed_forward2", "feed_forward3"):
                add(f"{p}.{ff}.in_proj.weight", ffn, d)
                add(f"{p}.{ff}.in_proj.bias", ffn)
                add(f"{p}.{ff}.out_proj.weight", d, ffn)
                add(f"{p}.{ff}.out_proj.bias", d)
            for cv in ("conv_module1", "conv_module2"):
                add(f"{p}.{cv}.in_proj.weight", 2 * d, d)
                add(f"{p}.{cv}.in_proj.bias", 2 * d)
                add(f"{p}.{cv}.depthwise_conv.weight", d, 1, enc_cfg.cnn_kernel[s])
                add(f"{p}.{cv}.depthwise_conv.bias", d)
                add(f"{p}.{cv}.out_proj.weight", d, d)
                add(f"{p}.{cv}.out_proj.bias", d)
            add(f"{p}.norm.bias", d)
            sd[f"{p}.norm.log_scale"] = torch.zeros(())
            add(f"{p}.bypass.bypass_scale", d)
            add(f"{p}.bypass_mid.bypass_scale", d)
        if enc_cfg.downsampling[s] > 1:
            add(f"encoder.encoders.{s}.downsample.bias", enc_cfg.downsampling[s])
            add(f"encoder.encoders.{s}.bypass.bypass_scale", d)

    v, dd, jd = rnnt_cfg.vocab_size, rnnt_cfg.pred_hidden, rnnt_cfg.joint_hidden
    add("decoder.embedding.weight", v, dd)
    add("decoder.conv.weight", dd, dd, rnnt_cfg.context_size)
    add("joiner.encoder_proj.weight", jd, rnnt_cfg.enc_dim)
    add("joiner.encoder_proj.bias", jd)
    add("joiner.decoder_proj.weight", jd, dd)
    add("joiner.decoder_proj.bias", jd)
    add("joiner.output_linear.weight", rnnt_cfg.num_classes, jd)
    add("joiner.output_linear.bias", rnnt_cfg.num_classes)
    return sd


# ---------------------------------------------------------------------------
# ONNX protobuf wire-format writer (matches convert/onnx_reader.py)
# ---------------------------------------------------------------------------


def encode_varint(n):
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def field(num, wt, payload):
    key = encode_varint(num << 3 | wt)
    if wt == 2:
        return key + encode_varint(len(payload)) + payload
    return key + payload


_ONNX_DTYPE = {np.dtype(np.float32): 1, np.dtype(np.int8): 3, np.dtype(np.int64): 7}


def onnx_tensor(name, arr):
    arr = np.ascontiguousarray(arr)
    body = b"".join(field(1, 0, encode_varint(d)) for d in arr.shape)
    body += field(2, 0, encode_varint(_ONNX_DTYPE[arr.dtype]))
    body += field(8, 2, name.encode())
    body += field(9, 2, arr.tobytes())
    return body


def write_onnx(path, tensors):
    """Write a minimal ModelProto whose graph holds ``tensors`` as
    initializers ({name: ndarray})."""
    graph = b"".join(field(5, 2, onnx_tensor(n, a)) for n, a in tensors.items())
    with open(path, "wb") as f:
        f.write(field(7, 2, graph))


# ---------------------------------------------------------------------------
# container writers
# ---------------------------------------------------------------------------


def write_nemo_archive(path, enc_cfg, rnnt_cfg, sd=None):
    """Write a faithful .nemo tar: model_config.yaml + model_weights.ckpt."""
    import yaml

    sd = sd or synth_nemo_state_dict(enc_cfg, rnnt_cfg)
    config = {
        "encoder": {
            "feat_in": enc_cfg.feat_in,
            "n_layers": enc_cfg.num_layers,
            "d_model": enc_cfg.d_model,
            "n_heads": enc_cfg.num_heads,
            "ff_expansion_factor": enc_cfg.ff_expansion,
            "conv_kernel_size": enc_cfg.conv_kernel,
            "subsampling_factor": enc_cfg.subsampling_factor,
            "subsampling_conv_channels": enc_cfg.subsampling_channels,
        },
        "decoder": {
            "prednet": {
                "pred_hidden": rnnt_cfg.pred_hidden,
                "pred_rnn_layers": rnnt_cfg.pred_rnn_layers,
            }
        },
        "joint": {
            "num_classes": rnnt_cfg.vocab_size,
            "jointnet": {
                "joint_hidden": rnnt_cfg.joint_hidden,
                "activation": rnnt_cfg.joint_activation,
            },
        },
        # the published model pins ALSD beam decoding (the reference's
        # decode.py strips its leading-blank artifact)
        "decoding": {
            "strategy": "alsd",
            "beam": {"beam_size": 4, "score_norm": True},
        },
    }
    ckpt = io.BytesIO()
    torch.save(sd, ckpt)
    with tarfile.open(path, "w") as tar:
        _add_bytes(tar, "model_config.yaml", yaml.safe_dump(config).encode())
        _add_bytes(tar, "model_weights.ckpt", ckpt.getvalue())
    return sd


def _add_bytes(tar, name, data):
    info = tarfile.TarInfo(name)
    info.size = len(data)
    tar.addfile(info, io.BytesIO(data))


def write_espnet_zoo(dirpath, enc_cfg, token_list, rnnt_cfg=None, sd=None):
    """Write an espnet-zoo layout: exp/<run>/{config.yaml,
    valid.acc.ave_10best.pth} (what Speech2Text.from_pretrained unpacks)."""
    import yaml

    run = os.path.join(dirpath, "exp", "asr_train_asr_conformer_raw_jp_char")
    os.makedirs(run, exist_ok=True)
    sd = sd or synth_espnet_state_dict(enc_cfg, len(token_list), rnnt_cfg)
    # GlobalMVN stats in the espnet collect_stats npz layout (the published
    # recipe normalizes features; the recorded stats_file path is the
    # training machine's — converters must fall back to the basename)
    rng = np.random.default_rng(7)
    count = 5000.0
    mean = rng.normal(-4.0, 1.0, enc_cfg.feat_in)
    var = rng.uniform(2.0, 6.0, enc_cfg.feat_in)
    np.savez(
        os.path.join(run, "feats_stats.npz"),
        count=np.array([count]),
        sum=mean * count,
        sum_square=(var + mean * mean) * count,
    )
    config = {
        "token_list": list(token_list),
        "encoder": "conformer",
        "encoder_conf": {
            "output_size": enc_cfg.d_model,
            "attention_heads": enc_cfg.num_heads,
            "num_blocks": enc_cfg.num_layers,
            "linear_units": enc_cfg.d_model * enc_cfg.ff_expansion,
            "cnn_module_kernel": enc_cfg.conv_kernel,
        },
        "normalize": "global_mvn",
        "normalize_conf": {
            "stats_file": "/training/machine/path/feats_stats.npz"
        },
    }
    with open(os.path.join(run, "config.yaml"), "w") as f:
        yaml.safe_dump(config, f, allow_unicode=True)
    torch.save(sd, os.path.join(run, "valid.acc.ave_10best.pth"))
    return sd


def write_k2_repo(dirpath, enc_cfg, rnnt_cfg, token_list, epochs=99,
                  int8=False, with_pt=True, sd=None):
    """Write a sherpa-style k2 repo: tokens.txt, decoder/joiner ONNX graphs
    (fp32 or int8 DynamicQuantizeLinear-style), icefall exp/pretrained.pt."""
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "tokens.txt"), "w", encoding="utf-8") as f:
        for i, tok in enumerate(token_list):
            f.write(f"{tok} {i}\n")

    sd = sd or synth_icefall_state_dict(enc_cfg, rnnt_cfg)

    def np_(t):
        return t.numpy() if isinstance(t, torch.Tensor) else np.asarray(t)

    def maybe_q(name, arr):
        if not int8:
            return {name: arr.astype(np.float32)}
        scale = np.abs(arr).max() / 127.0 + 1e-12
        q = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
        return {name + "_quantized": q, name + "_scale": np.float32(scale)}

    dec = {}
    dec.update(maybe_q("embedding.weight", np_(sd["decoder.embedding.weight"])))
    dec.update(maybe_q("conv.weight", np_(sd["decoder.conv.weight"])))
    joi = {}
    joi.update(maybe_q("encoder_proj.weight", np_(sd["joiner.encoder_proj.weight"])))
    joi["encoder_proj.bias"] = np_(sd["joiner.encoder_proj.bias"]).astype(np.float32)
    joi.update(maybe_q("decoder_proj.weight", np_(sd["joiner.decoder_proj.weight"])))
    joi["decoder_proj.bias"] = np_(sd["joiner.decoder_proj.bias"]).astype(np.float32)
    joi.update(maybe_q("output_linear.weight", np_(sd["joiner.output_linear.weight"])))
    joi["output_linear.bias"] = np_(sd["joiner.output_linear.bias"]).astype(np.float32)

    sfx = ".int8.onnx" if int8 else ".onnx"
    write_onnx(os.path.join(dirpath, f"decoder-epoch-{epochs}-avg-1{sfx}"), dec)
    write_onnx(os.path.join(dirpath, f"joiner-epoch-{epochs}-avg-1{sfx}"), joi)
    # the encoder graph's weights are constant-folded in real exports; an
    # empty-initializer graph stands in (conversion uses the .pt anyway)
    write_onnx(os.path.join(dirpath, f"encoder-epoch-{epochs}-avg-1{sfx}"), {})
    if with_pt:
        os.makedirs(os.path.join(dirpath, "exp"), exist_ok=True)
        torch.save({"model": sd}, os.path.join(dirpath, "exp", "pretrained.pt"))
    return sd


def synth_avhubert_state_dict(cfg):
    """Random tensors with the HF AVHuBERT naming the converter consumes
    (convert/hf_avhubert.py; reference pkg/avsr/src/avhubert/ module tree)."""
    d, ff = cfg.hidden_size, cfg.intermediate_size
    dd, dff = cfg.decoder_hidden_size, cfg.decoder_ffn_dim
    v = cfg.vocab_size
    sd = {}

    def add(name, *shape):
        sd["model." + name] = rt(*shape)

    def add_bn(p, ch):
        add(f"{p}.weight", ch)
        add(f"{p}.bias", ch)
        sd[f"model.{p}.running_mean"] = rt(ch) * 0.1
        sd[f"model.{p}.running_var"] = rt(ch).abs() + 0.5

    add("feature_extractor_audio.proj.weight", d, cfg.audio_feat_dim)
    add("feature_extractor_audio.proj.bias", d)
    add("feature_extractor_video.proj.weight", d, 512)
    add("feature_extractor_video.proj.bias", d)
    add("layer_norm.weight", cfg.fused_dim)
    add("layer_norm.bias", cfg.fused_dim)
    if cfg.fused_dim != d:
        add("post_extract_proj.weight", d, cfg.fused_dim)
        add("post_extract_proj.bias", d)
    g = cfg.num_conv_pos_embedding_groups
    # stored weight-normalized (dim=2), like HF Hubert checkpoints
    add("encoder.pos_conv_embed.conv.weight_g", 1, 1, cfg.num_conv_pos_embeddings)
    sd["model.encoder.pos_conv_embed.conv.weight_g"] = (
        sd["model.encoder.pos_conv_embed.conv.weight_g"].abs() + 0.1
    )
    add("encoder.pos_conv_embed.conv.weight_v", d, d // g, cfg.num_conv_pos_embeddings)
    add("encoder.pos_conv_embed.conv.bias", d)
    add("encoder.layer_norm.weight", d)
    add("encoder.layer_norm.bias", d)
    for n in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{n}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            add(f"{p}.attention.{proj}.weight", d, d)
            add(f"{p}.attention.{proj}.bias", d)
        for ln in ("layer_norm", "final_layer_norm"):
            add(f"{p}.{ln}.weight", d)
            add(f"{p}.{ln}.bias", d)
        add(f"{p}.feed_forward.intermediate_dense.weight", ff, d)
        add(f"{p}.feed_forward.intermediate_dense.bias", ff)
        add(f"{p}.feed_forward.output_dense.weight", d, ff)
        add(f"{p}.feed_forward.output_dense.bias", d)

    rp = "feature_extractor_video.resnet"
    add(f"{rp}.frontend3D.0.weight", 64, 1, 5, 7, 7)
    add_bn(f"{rp}.frontend3D.1", 64)
    add(f"{rp}.frontend3D.2.weight", 64)  # PReLU
    in_ch = 64
    for s, out_ch in zip((1, 2, 3, 4), (64, 128, 256, 512)):
        for b in range(2):
            p = f"{rp}.trunk.layer{s}.{b}"
            first = b == 0
            cin = in_ch if first else out_ch
            add(f"{p}.conv1.weight", out_ch, cin, 3, 3)
            add_bn(f"{p}.bn1", out_ch)
            add(f"{p}.relu1.weight", out_ch)
            add(f"{p}.conv2.weight", out_ch, out_ch, 3, 3)
            add_bn(f"{p}.bn2", out_ch)
            add(f"{p}.relu2.weight", out_ch)
            if first and (s != 1):
                add(f"{p}.downsample.0.weight", out_ch, cin, 1, 1)
                add_bn(f"{p}.downsample.1", out_ch)
        in_ch = out_ch

    add("decoder.embed_tokens.weight", v, dd)
    add("decoder.layer_norm.weight", dd)
    add("decoder.layer_norm.bias", dd)
    for n in range(cfg.decoder_layers):
        p = f"decoder.layers.{n}"
        for attn, kv in (("self_attn", dd), ("encoder_attn", d)):
            add(f"{p}.{attn}.q_proj.weight", dd, dd)
            add(f"{p}.{attn}.q_proj.bias", dd)
            add(f"{p}.{attn}.k_proj.weight", dd, kv)
            add(f"{p}.{attn}.k_proj.bias", dd)
            add(f"{p}.{attn}.v_proj.weight", dd, kv)
            add(f"{p}.{attn}.v_proj.bias", dd)
            add(f"{p}.{attn}.out_proj.weight", dd, dd)
            add(f"{p}.{attn}.out_proj.bias", dd)
        for ln in ("self_attn_layer_norm", "encoder_attn_layer_norm",
                   "final_layer_norm"):
            add(f"{p}.{ln}.weight", dd)
            add(f"{p}.{ln}.bias", dd)
        add(f"{p}.fc1.weight", dff, dd)
        add(f"{p}.fc1.bias", dff)
        add(f"{p}.fc2.weight", dd, dff)
        add(f"{p}.fc2.bias", dd)
    if not cfg.tie_word_embeddings:
        sd["lm_head.weight"] = rt(v, dd)
    return sd


def write_avhubert_hf_dir(dirpath, cfg, sd=None):
    """Write an HF checkpoint directory: config.json + pytorch_model.bin."""
    import json

    os.makedirs(dirpath, exist_ok=True)
    sd = sd or synth_avhubert_state_dict(cfg)
    raw = {k: getattr(cfg, k) for k in cfg.__dataclass_fields__}
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump(raw, f)
    torch.save(sd, os.path.join(dirpath, "pytorch_model.bin"))
    return sd


def write_hf_snapshot(cache_root, repo_id, build, rev="0" * 40):
    """Create an HF-hub cache snapshot for ``repo_id``; ``build(snapdir)``
    populates it. Returns the snapshot dir."""
    repo = os.path.join(cache_root, "models--" + repo_id.replace("/", "--"))
    snap = os.path.join(repo, "snapshots", rev)
    os.makedirs(snap, exist_ok=True)
    os.makedirs(os.path.join(repo, "refs"), exist_ok=True)
    with open(os.path.join(repo, "refs", "main"), "w") as f:
        f.write(rev)
    build(snap)
    return snap
