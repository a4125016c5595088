"""Independent torch-CPU oracle for the converted-checkpoint parity gate.

Implements the published models' forward semantics (NeMo FastConformer-RNNT,
ESPnet Conformer, icefall Zipformer decoder/joiner) directly on a torch
state dict with the ORIGINAL module naming — the same tensors the converters
consume. tools/convert_and_gate.py runs audio through this oracle and
through the JAX pipeline and demands logit- and token-level agreement, which
is the layer-wiring check primitive-level conversion tests can't provide
(VERDICT.md round 1, "Next round" item 1).

This is a first-party reimplementation from the architectures' published
descriptions (cited per function); it is deliberately simple/slow — an
oracle, not a runtime.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F

__all__ = [
    "nemo_encoder_forward",
    "espnet_encoder_forward",
    "zipformer_encoder_forward",
    "rnnt_greedy_reference",
    "rnnt_alsd_reference",
    "stateless_greedy_reference",
    "espnet_ctc_log_softmax",
]


def _lin(sd, p, x):
    return F.linear(x, sd[f"{p}.weight"], sd.get(f"{p}.bias"))


def _ln(sd, p, x):
    return F.layer_norm(x, x.shape[-1:], sd[f"{p}.weight"], sd[f"{p}.bias"])


def _rel_pos_table(t, d):
    """Sinusoidal table for offsets [t-1 .. -(t-1)]: [2t-1, d]."""
    pos = np.arange(t - 1, -t, -1, dtype=np.float64)
    inv = np.exp(-np.arange(0, d, 2, dtype=np.float64) * (math.log(10000.0) / d))
    ang = pos[:, None] * inv[None, :]
    pe = np.zeros((2 * t - 1, d), np.float32)
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return torch.from_numpy(pe)


def _relpos_mhsa(sd, p, x, pos_emb, num_heads):
    """Transformer-XL relative-position MHSA (pos_bias_u/v, rel-shift)."""
    b, t, d = x.shape
    h, dh = num_heads, d // num_heads
    q = _lin(sd, f"{p}.linear_q", x).view(b, t, h, dh)
    k = _lin(sd, f"{p}.linear_k", x).view(b, t, h, dh)
    v = _lin(sd, f"{p}.linear_v", x).view(b, t, h, dh)
    pos = F.linear(pos_emb, sd[f"{p}.linear_pos.weight"]).view(-1, h, dh)

    qu = q + sd[f"{p}.pos_bias_u"]
    qv = q + sd[f"{p}.pos_bias_v"]
    ac = torch.einsum("bthd,bshd->bhts", qu, k)
    bd_all = torch.einsum("bthd,lhd->bhtl", qv, pos)  # [B,H,T,2T-1]
    # out[..., t, s] = bd_all[..., t, T-1-t+s]
    idx = (torch.arange(t).view(t, 1) * -1 + (t - 1) + torch.arange(t).view(1, t))
    bd = bd_all.gather(3, idx.view(1, 1, t, t).expand(b, h, t, t))

    scores = (ac + bd) / math.sqrt(dh)
    probs = torch.softmax(scores, dim=-1)
    out = torch.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, d)
    return _lin(sd, f"{p}.linear_out", out)


def _conv_module(sd, p, x, norm="batch_norm"):
    """Conformer conv module: pointwise(2d)+GLU → depthwise(SAME) → norm →
    swish → pointwise."""
    y = x.transpose(1, 2)  # [B, D, T]
    y = F.conv1d(y, sd[f"{p}.pointwise_conv1.weight"], sd.get(f"{p}.pointwise_conv1.bias"))
    y = F.glu(y, dim=1)
    dw = sd[f"{p}.depthwise_conv.weight"]
    y = F.conv1d(y, dw, sd.get(f"{p}.depthwise_conv.bias"),
                 padding=dw.shape[-1] // 2, groups=y.shape[1])
    if norm == "batch_norm":
        y = F.batch_norm(
            y, sd[f"{p}.batch_norm.running_mean"], sd[f"{p}.batch_norm.running_var"],
            sd[f"{p}.batch_norm.weight"], sd[f"{p}.batch_norm.bias"], training=False,
        )
    else:  # espnet layer-norm conv module ("norm" submodule)
        y = y.transpose(1, 2)
        y = _ln(sd, f"{p}.norm", y)
        y = y.transpose(1, 2)
    y = F.silu(y)
    y = F.conv1d(y, sd[f"{p}.pointwise_conv2.weight"], sd.get(f"{p}.pointwise_conv2.bias"))
    return y.transpose(1, 2)


def nemo_encoder_forward(sd, feats, num_layers, num_heads, d_model,
                         subsampling_stages=3):
    """NeMo FastConformer encoder forward (dw_striding subsampling 8×,
    batch-norm conv modules, per-layer norm_out). feats: [B, T, F] fp32.
    Mirrors the architecture behind pkg/nemo-asr/src/transcribe.py:26-28."""
    x = feats.unsqueeze(1)  # [B, 1, T, F]
    x = F.relu(F.conv2d(x, sd["encoder.pre_encode.conv.0.weight"],
                        sd["encoder.pre_encode.conv.0.bias"], stride=2, padding=1))
    idx = 2
    for _ in range(1, subsampling_stages):
        c = x.shape[1]
        x = F.conv2d(x, sd[f"encoder.pre_encode.conv.{idx}.weight"],
                     sd[f"encoder.pre_encode.conv.{idx}.bias"], stride=2,
                     padding=1, groups=c)
        x = F.relu(F.conv2d(x, sd[f"encoder.pre_encode.conv.{idx+1}.weight"],
                            sd[f"encoder.pre_encode.conv.{idx+1}.bias"]))
        idx += 3
    b, c, t, f = x.shape
    x = x.permute(0, 2, 1, 3).reshape(b, t, c * f)
    x = _lin(sd, "encoder.pre_encode.out", x)
    x = x * math.sqrt(d_model)

    pos_emb = _rel_pos_table(t, d_model)
    for n in range(num_layers):
        p = f"encoder.layers.{n}"
        x = x + 0.5 * _ffn(sd, f"{p}.feed_forward1", f"{p}.norm_feed_forward1", x)
        x = x + _relpos_mhsa(sd, f"{p}.self_attn", _ln(sd, f"{p}.norm_self_att", x),
                             pos_emb, num_heads)
        x = x + _conv_module(sd, f"{p}.conv", _ln(sd, f"{p}.norm_conv", x))
        x = x + 0.5 * _ffn(sd, f"{p}.feed_forward2", f"{p}.norm_feed_forward2", x)
        x = _ln(sd, f"{p}.norm_out", x)
    return x


def _ffn(sd, p, ln_p, x, w1="linear1", w2="linear2"):
    y = _ln(sd, ln_p, x)
    y = F.silu(_lin(sd, f"{p}.{w1}", y))
    return _lin(sd, f"{p}.{w2}", y)


def espnet_encoder_forward(sd, feats, num_layers, num_heads, d_model):
    """ESPnet Conformer encoder forward (Conv2dSubsampling 4× VALID, macaron
    FFNs, layer-norm conv modules, per-layer norm_final + encoder after_norm).
    Mirrors the model behind pkg/espnet-asr/src/transcribe.py:27-32."""
    x = feats.unsqueeze(1)
    x = F.relu(F.conv2d(x, sd["encoder.embed.conv.0.weight"],
                        sd["encoder.embed.conv.0.bias"], stride=2))
    x = F.relu(F.conv2d(x, sd["encoder.embed.conv.2.weight"],
                        sd["encoder.embed.conv.2.bias"], stride=2))
    b, c, t, f = x.shape
    x = x.permute(0, 2, 1, 3).reshape(b, t, c * f)
    x = _lin(sd, "encoder.embed.out.0", x)
    x = x * math.sqrt(d_model)

    pos_emb = _rel_pos_table(t, d_model)
    for n in range(num_layers):
        p = f"encoder.encoders.{n}"
        x = x + 0.5 * _ffn(sd, f"{p}.feed_forward_macaron",
                           f"{p}.norm_ff_macaron", x, "w_1", "w_2")
        x = x + _relpos_mhsa(sd, f"{p}.self_attn", _ln(sd, f"{p}.norm_mha", x),
                             pos_emb, num_heads)
        x = x + _conv_module(sd, f"{p}.conv_module",
                             _ln(sd, f"{p}.norm_conv", x), norm="layer_norm")
        x = x + 0.5 * _ffn(sd, f"{p}.feed_forward", f"{p}.norm_ff", x, "w_1", "w_2")
        x = _ln(sd, f"{p}.norm_final", x)
    return _ln(sd, "encoder.after_norm", x)


def espnet_ctc_log_softmax(sd, enc):
    return torch.log_softmax(_lin(sd, "ctc.ctc_lo", enc), dim=-1)


# ---------------------------------------------------------------------------
# transducer greedy oracles
# ---------------------------------------------------------------------------


def _rnnt_networks(sd, vocab_size, pred_rnn_layers, joint_activation,
                   prefix, joint_prefix, blank_first):
    """Build pure (embed, lstm_step, joint, zero_state, blank) closures over
    a transducer state dict in NeMo naming (default) or espnet JointNetwork
    naming (blank_first=True). ``lstm_step`` is pure: it returns a NEW state
    tuple, so beam search can branch states safely."""
    act = {"relu": F.relu, "tanh": torch.tanh, "sigmoid": torch.sigmoid}[joint_activation]
    hidden = sd[f"{prefix}.dec_rnn.lstm.weight_hh_l0" if not blank_first
                else f"{prefix}.decoder.0.weight_hh_l0"].shape[1]
    blank = 0 if blank_first else vocab_size

    def embed(tok):
        table = sd[f"{prefix}.embed.weight"]
        if not blank_first and tok == blank:
            return torch.zeros(table.shape[1])
        return table[tok]

    def lstm_step(x, state):
        new_state = []
        for li in range(pred_rnn_layers):
            if blank_first:
                wi = sd[f"{prefix}.decoder.{li}.weight_ih_l0"]
                wh = sd[f"{prefix}.decoder.{li}.weight_hh_l0"]
                bi = sd[f"{prefix}.decoder.{li}.bias_ih_l0"]
                bh = sd[f"{prefix}.decoder.{li}.bias_hh_l0"]
            else:
                wi = sd[f"{prefix}.dec_rnn.lstm.weight_ih_l{li}"]
                wh = sd[f"{prefix}.dec_rnn.lstm.weight_hh_l{li}"]
                bi = sd[f"{prefix}.dec_rnn.lstm.bias_ih_l{li}"]
                bh = sd[f"{prefix}.dec_rnn.lstm.bias_hh_l{li}"]
            h, c = state[li]
            gates = wi @ x + wh @ h + bi + bh
            i, f_, g, o = gates.chunk(4)
            c = torch.sigmoid(f_) * c + torch.sigmoid(i) * torch.tanh(g)
            h = torch.sigmoid(o) * torch.tanh(c)
            new_state.append((h, c))
            x = h
        return x, tuple(new_state)

    def joint(e, g):
        if blank_first:  # espnet JointNetwork naming
            z = act(_lin(sd, f"{joint_prefix}.lin_enc", e)
                    + _lin(sd, f"{joint_prefix}.lin_dec", g))
            return _lin(sd, f"{joint_prefix}.lin_out", z)
        z = act(_lin(sd, f"{joint_prefix}.enc", e)
                + _lin(sd, f"{joint_prefix}.pred", g))
        return _lin(sd, f"{joint_prefix}.joint_net.2", z)

    def zero_state():
        return tuple((torch.zeros(hidden), torch.zeros(hidden))
                     for _ in range(pred_rnn_layers))

    return embed, lstm_step, joint, zero_state, blank


def rnnt_greedy_reference(sd, enc, vocab_size, pred_rnn_layers=1,
                          joint_activation="relu", max_symbols=10,
                          prefix="decoder.prediction", joint_prefix="joint",
                          blank_first=False):
    """Greedy RNN-T decode with an LSTM prediction network.

    NeMo convention (default): blank == vocab_size, SOS embeds to zeros.
    ESPnet convention (blank_first=True, prefix/joint_prefix set to
    'decoder'/'joint_network' naming by the caller): blank == 0 with a real
    embedding row. enc: [T, D]. Returns (tokens, frames).
    """
    embed, lstm_step, joint, zero_state, blank = _rnnt_networks(
        sd, vocab_size, pred_rnn_layers, joint_activation, prefix,
        joint_prefix, blank_first)

    g, state = lstm_step(embed(blank), zero_state())
    tokens, frames = [], []
    with torch.no_grad():
        for t in range(enc.shape[0]):
            for _ in range(max_symbols):
                k = int(torch.argmax(joint(enc[t], g)))
                if k == blank:
                    break
                tokens.append(k)
                frames.append(t)
                g, state = lstm_step(embed(k), state)
    return tokens, frames


def rnnt_alsd_reference(sd, enc, vocab_size, beam_size=4,
                        alsd_max_target_len=1.0, score_norm=True,
                        recombine_dedup=False, pred_rnn_layers=1,
                        joint_activation="relu",
                        prefix="decoder.prediction", joint_prefix="joint",
                        blank_first=False):
    """Serial ALSD beam search — our reading of NeMo's
    ``BeamRNNTInfer.align_length_sync_decoding`` (the decode strategy behind
    the reference's transcribe, pkg/nemo-asr/src/transcribe.py:48-53 +
    decode.py:33-40). Alignment-length-synchronous: at loop step i every
    hypothesis has t + u == i; each proposes a blank extension plus its top
    ``beam_size`` labels; the top ``beam_size`` of all proposals survive;
    identical label sequences recombine by log-add into the earliest
    occurrence (``recombine_dedup=False`` keeps the duplicate in the beam,
    NeMo's ``recombine_hypotheses`` return-value behavior); a blank extension
    consuming the last frame is recorded as final; the best final under
    length-normalised score (``score_norm``, length counts ALSD's leading
    blank) wins, falling back to the live beam when nothing finalised.

    enc: [T, D]. Returns (tokens, frames, score) of the best hypothesis.
    """
    embed, lstm_step, joint, zero_state, blank = _rnnt_networks(
        sd, vocab_size, pred_rnn_layers, joint_activation, prefix,
        joint_prefix, blank_first)

    T = enc.shape[0]
    u_max = int(alsd_max_target_len * T)
    # candidate labels exclude blank; topk size = beam (NeMo beam expansion)
    n_labels = min(beam_size, vocab_size - 1 if blank_first else vocab_size)
    g0, st0 = lstm_step(embed(blank), zero_state())
    hyps = [{"score": 0.0, "toks": (), "frames": (), "g": g0, "state": st0}]
    final = []

    def sort_key(h):
        if score_norm:
            return h["score"] / (len(h["toks"]) + 1)  # + leading blank
        return h["score"]

    with torch.no_grad():
        for i in range(T + u_max):
            B_ = [h for h in hyps if i - len(h["toks"]) <= T - 1]
            if not B_:
                break
            A = []
            for hyp in B_:
                t_idx = i - len(hyp["toks"])
                logp = F.log_softmax(joint(enc[t_idx], hyp["g"]), dim=-1)
                blank_hyp = dict(hyp, score=hyp["score"] + float(logp[blank]))
                A.append(blank_hyp)
                if t_idx == T - 1:
                    # value snapshot (NeMo aliases the object; module notes
                    # in decoding/rnnt_beam.py)
                    final.append(dict(blank_hyp))
                label_lp = logp.clone()
                label_lp[blank] = float("-inf")
                vals, idxs = label_lp.topk(n_labels)
                for lv, li in zip(vals.tolist(), idxs.tolist()):
                    g2, st2 = lstm_step(embed(li), hyp["state"])
                    A.append({
                        "score": hyp["score"] + lv,
                        "toks": hyp["toks"] + (li,),
                        "frames": hyp["frames"] + (t_idx,),
                        "g": g2,
                        "state": st2,
                    })
            hyps = sorted(A, key=lambda h: h["score"], reverse=True)[:beam_size]
            # recombine identical label sequences (log-add into the earliest)
            leaders = {}
            kept = []
            for hyp in hyps:
                match = leaders.get(hyp["toks"])
                if match is None:
                    leaders[hyp["toks"]] = hyp
                    kept.append(hyp)
                else:
                    match["score"] = float(np.logaddexp(match["score"], hyp["score"]))
                    if not recombine_dedup:
                        kept.append(hyp)
            hyps = kept

    pool = final if final else hyps
    best = max(pool, key=sort_key)
    return list(best["toks"]), list(best["frames"]), best["score"]


def espnet_default_beam_reference(sd, enc, vocab_size, beam_size=20,
                                  score_norm=True, max_pops_per_frame=None,
                                  kept_capacity=None, max_tokens=None,
                                  pred_rnn_layers=1,
                                  joint_activation="tanh"):
    """Serial Graves-style transducer beam search — our reading of ESPnet's
    ``BeamSearchTransducer.default_beam_search`` (the decode behind the
    reference's ``Speech2Text`` call, pkg/espnet-asr/src/transcribe.py:27-32,69;
    Speech2Text defaults beam_size=20, score_norm=True, no LM since the
    reference passes lm_weight=0).

    Time-synchronous best-first expansion per frame: pop the highest-scoring
    pending hypothesis, add its blank extension to the kept set, push its top
    ``beam_size`` label extensions (blank is espnet id 0, excluded); the
    frame ends when at least ``beam_size`` kept hypotheses score above the
    best pending one (only those survive). Result: best kept hypothesis under
    ``score / len(yseq)`` (the leading blank counts).

    ``max_pops_per_frame`` bounds the (unbounded in ESPnet) inner loop and
    ``kept_capacity`` the carried survivor set, so the fixed-shape TPU
    decoder can be gated token-exact; None reproduces ESPnet. On a capped
    frame the survivors are the best ``beam_size`` kept hypotheses; a
    capacity overflow drops the lowest-scoring survivors. enc: [T, D].
    Returns (tokens, frames, score).
    """
    embed, lstm_step, joint, zero_state, blank = _rnnt_networks(
        sd, vocab_size, pred_rnn_layers, joint_activation,
        prefix="decoder", joint_prefix="joint_network", blank_first=True)
    beam = min(beam_size, vocab_size)
    beam_k = min(beam, vocab_size - 1)

    # hyp: score, toks, frames, last (token fed when scored), state_pre
    hyps0 = [{"score": 0.0, "toks": (), "frames": (), "last": blank,
              "state": zero_state()}]
    kept_hyps = hyps0
    with torch.no_grad():
        for t in range(enc.shape[0]):
            hyps = list(kept_hyps)
            kept_hyps = []
            pops = 0
            while True:
                max_hyp = max(hyps, key=lambda x: x["score"])
                hyps.remove(max_hyp)
                pops += 1
                dec_out, state = lstm_step(embed(max_hyp["last"]),
                                           max_hyp["state"])
                logp = F.log_softmax(joint(enc[t], dec_out), dim=-1)
                kept_hyps.append(dict(max_hyp,
                                      score=max_hyp["score"] + float(logp[blank])))
                if max_tokens is None or len(max_hyp["toks"]) < max_tokens:
                    vals, idxs = logp[1:].topk(beam_k)
                    for lv, li in zip(vals.tolist(), idxs.tolist()):
                        hyps.append({
                            "score": max_hyp["score"] + lv,
                            "toks": max_hyp["toks"] + (li + 1,),
                            "frames": max_hyp["frames"] + (t,),
                            "last": li + 1,
                            "state": state,
                        })
                hyps_max = max(h["score"] for h in hyps) if hyps else -1e30
                most_prob = sorted(
                    (h for h in kept_hyps if h["score"] > hyps_max),
                    key=lambda x: x["score"])
                if len(most_prob) >= beam:
                    kept_hyps = most_prob
                    break
                if (max_pops_per_frame is not None
                        and pops >= max_pops_per_frame) or not hyps:
                    kept_hyps = sorted(kept_hyps, key=lambda x: x["score"],
                                       reverse=True)[:beam]
                    break
            if kept_capacity is not None and len(kept_hyps) > kept_capacity:
                kept_hyps = sorted(kept_hyps, key=lambda x: x["score"],
                                   reverse=True)[:kept_capacity]

    def key(h):
        return h["score"] / (len(h["toks"]) + 1) if score_norm else h["score"]

    best = max(kept_hyps, key=key)
    return list(best["toks"]), list(best["frames"]), best["score"]


def espnet_maes_beam_reference(sd, enc, vocab_size, beam_size=20, nstep=2,
                               expansion_beta=2, expansion_gamma=2.3,
                               prefix_alpha=1, score_norm=True,
                               max_tokens=None, pred_rnn_layers=1,
                               joint_activation="tanh"):
    """Serial modified Adaptive Expansion Search — our bounded reading of
    Kim & Sung (IEEE SPL 2020), the algorithm ESPnet offers as
    ``search_type="maes"`` (the alignment-synchronous alternative to the
    default_beam_search the reference serves, pkg/espnet-asr/src/
    transcribe.py:69). This oracle mirrors the fixed-shape TPU variant
    (decoding/transducer_maes.py) exactly:

    - per frame, prefix merge (alpha 1: a hypothesis one label short of
      another logaddexp-donates its mass of emitting the missing label;
      donor scores are pre-merge), then up to ``nstep`` expansion steps;
    - candidates per hypothesis = blank (always offered) + top
      ``beam + beta`` labels, pruned to within ``gamma`` of the hypothesis'
      best candidate;
    - blank extensions accumulate in a kept list (capped at beam, lossless);
      label expansions are pruned to the global top ``beam`` each step (the
      bounded divergence from ESPnet's unpruned list);
    - after the last step the surviving expansions are blank-terminated
      with their NEW dec_out's blank log-prob and merged with the kept
      list, top ``beam`` survives.

    Ties break by (score desc, insertion order asc) — the same order as the
    batched top_k. enc: [T, D]. Returns (tokens, frames, score).
    """
    embed, lstm_step, joint, zero_state, blank = _rnnt_networks(
        sd, vocab_size, pred_rnn_layers, joint_activation,
        prefix="decoder", joint_prefix="joint_network", blank_first=True)
    K = min(beam_size, vocab_size)
    m_lab = min(beam_size + expansion_beta, vocab_size - 1)
    T = enc.shape[0]
    u_cap = max_tokens if max_tokens is not None else T

    def topk_hyps(cands):
        order = sorted(range(len(cands)),
                       key=lambda i: (-cands[i]["score"], i))
        return [cands[i] for i in order[:K]]

    with torch.no_grad():
        g0, st0 = lstm_step(embed(blank), zero_state())
        hyps = [{"score": 0.0, "toks": (), "frames": (), "g": g0,
                 "state": st0}]
        for t in range(T):
            if prefix_alpha:
                logps = [F.log_softmax(joint(enc[t], h["g"]), dim=-1)
                         for h in hyps]
                pre = [h["score"] for h in hyps]
                for j, hj in enumerate(hyps):
                    for i, hi in enumerate(hyps):
                        li, lj = len(hi["toks"]), len(hj["toks"])
                        if lj == li + 1 and hj["toks"][:li] == hi["toks"]:
                            miss = hj["toks"][li]
                            hj["score"] = float(np.logaddexp(
                                hj["score"], pre[i] + float(logps[i][miss])))
            list_b = []
            work = hyps
            for n in range(nstep):
                new_exp = []
                for h in work:
                    logp = F.log_softmax(joint(enc[t], h["g"]), dim=-1)
                    lp_blank = float(logp[blank])
                    lab = logp.clone()
                    lab[blank] = float("-inf")
                    vals, idxs = lab.topk(m_lab)
                    best = h["score"] + max(lp_blank, float(vals[0]))
                    if h["score"] + lp_blank >= best - expansion_gamma:
                        list_b.append(dict(
                            h, score=h["score"] + lp_blank))
                    if len(h["toks"]) < u_cap:
                        for lv, li_ in zip(vals.tolist(), idxs.tolist()):
                            s = h["score"] + lv
                            if s >= best - expansion_gamma:
                                new_exp.append({
                                    "score": s,
                                    "toks": h["toks"] + (li_,),
                                    "frames": h["frames"] + (t,),
                                    "state": h["state"],
                                    "g": None,
                                })
                list_b = topk_hyps(list_b)
                new_exp = topk_hyps(new_exp)
                for e in new_exp:
                    e["g"], e["state"] = lstm_step(
                        embed(e["toks"][-1]), e["state"])
                work = new_exp
                if not new_exp:
                    break
            fin = []
            for h in work:
                logp = F.log_softmax(joint(enc[t], h["g"]), dim=-1)
                fin.append(dict(h, score=h["score"] + float(logp[blank])))
            hyps = topk_hyps(list_b + fin)

    def key(h):
        return h["score"] / (len(h["toks"]) + 1) if score_norm else h["score"]

    best = max(hyps, key=key)
    return list(best["toks"]), list(best["frames"]), best["score"]


def stateless_greedy_reference(sd, enc, context_size=2, max_symbols=10):
    """Greedy decode with the icefall stateless predictor (embedding of the
    last ``context_size`` tokens → context conv → relu; blank == 0) and the
    icefall joiner naming. enc: [T, D]."""
    blank = 0

    def pred(context):
        emb = torch.stack([sd["decoder.embedding.weight"][c] for c in context])
        # decoder.conv is Conv1d [D, D, ctx] over the context axis
        y = torch.einsum("kd,dek->e", emb,
                         sd["decoder.conv.weight"].permute(1, 0, 2))
        if "decoder.conv.bias" in sd:
            y = y + sd["decoder.conv.bias"]
        return F.relu(y)

    def joint(e, g):
        z = torch.tanh(_lin(sd, "joiner.encoder_proj", e)
                       + _lin(sd, "joiner.decoder_proj", g))
        return _lin(sd, "joiner.output_linear", z)

    context = [blank] * context_size
    g = pred(context)
    tokens, frames = [], []
    with torch.no_grad():
        for t in range(enc.shape[0]):
            for _ in range(max_symbols):
                k = int(torch.argmax(joint(enc[t], g)))
                if k == blank:
                    break
                tokens.append(k)
                frames.append(t)
                context = context[1:] + [k]
                g = pred(context)
    return tokens, frames


# ---------------------------------------------------------------------------
# frontend oracles (waveform -> features)
#
# Independent torch implementations of the three audio frontends the
# published checkpoints were trained with, written from their sources'
# published semantics (cited per function) — NOT from reazonspeech_tpu's
# frontend code. convert_and_gate.py feeds synthetic *waveforms* through
# these + the encoder oracles and demands end-to-end token parity, which
# closes the frontend out of the round-2 gate's mel-in blind spot
# (VERDICT.md round 2, item 2).
# ---------------------------------------------------------------------------


def slaney_mel_banks(n_mels, n_fft, sr, fmin=0.0, fmax=None):
    """librosa.filters.mel(htk=False, norm='slaney') — the filterbank NeMo
    and ESPnet pin. Slaney scale: linear below 1 kHz (200/3 Hz per mel),
    logarithmic above (27 mels per factor 6.4); triangles over FFT bin
    frequencies; 'slaney' area normalization 2/(f[m+2]-f[m]).
    Returns torch [n_mels, n_fft//2 + 1]."""
    if fmax is None:
        fmax = sr / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        min_log_hz = 1000.0
        f_sp = 200.0 / 3.0
        logstep = np.log(6.4) / 27.0
        mel = f / f_sp
        above = f >= min_log_hz
        mel = np.where(above, min_log_hz / f_sp + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        min_log_hz = 1000.0
        f_sp = 200.0 / 3.0
        logstep = np.log(6.4) / 27.0
        min_log_mel = min_log_hz / f_sp
        f = m * f_sp
        above = m >= min_log_mel
        return np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    f_pts = mel_to_hz(mels)  # [n_mels + 2]
    fft_f = np.arange(n_fft // 2 + 1) * (sr / n_fft)
    fdiff = np.diff(f_pts)
    ramps = f_pts[:, None] - fft_f[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    w = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
    w = w * enorm[:, None]
    return torch.from_numpy(w.astype(np.float32))


def kaldi_mel_banks(n_mels, n_fft, sr, fmin=20.0, fmax=None):
    """Kaldi MelBanks (kaldi-native-fbank): HTK mel scale
    1127·ln(1 + f/700), triangle weights computed IN MEL DOMAIN, no area
    norm, and only the first n_fft//2 FFT bins (kaldi's num_fft_bins
    excludes the nyquist bin). Returns torch [n_mels, n_fft//2]."""
    if fmax is None or fmax <= 0:
        fmax = sr / 2.0 + (0.0 if fmax is None else fmax)
    mel = lambda f: 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)
    mel_low, mel_high = mel(fmin), mel(fmax)
    delta = (mel_high - mel_low) / (n_mels + 1)
    bins = np.arange(n_fft // 2) * (sr / n_fft)
    bin_mel = mel(bins)
    w = np.zeros((n_mels, n_fft // 2))
    for m in range(n_mels):
        left = mel_low + m * delta
        center = left + delta
        right = center + delta
        up = (bin_mel - left) / (center - left)
        down = (right - bin_mel) / (right - center)
        w[m] = np.clip(np.minimum(up, down), 0.0, None)
    return torch.from_numpy(w.astype(np.float32))


def nemo_preprocessor_reference(wave, n_mels=80, sr=16000, n_fft=512,
                                win_length=400, hop_length=160):
    """NeMo AudioToMelSpectrogramPreprocessor (FilterbankFeatures) in eval
    mode: dither 0, global preemphasis 0.97, symmetric hann, centered
    reflect-pad torch.stft, power spectrum, librosa slaney mel, log(x+2^-24),
    per-feature normalization over the valid frames (unbiased std + 1e-5).
    wave: np/torch [N] -> torch [T, n_mels]."""
    x = torch.as_tensor(wave, dtype=torch.float32)
    x = torch.cat([x[:1], x[1:] - 0.97 * x[:-1]])
    window = torch.hann_window(win_length, periodic=False)
    spec = torch.stft(x, n_fft=n_fft, hop_length=hop_length,
                      win_length=win_length, window=window, center=True,
                      return_complex=True)
    power = spec.real ** 2 + spec.imag ** 2  # [K, T]
    mel = slaney_mel_banks(n_mels, n_fft, sr)
    feats = torch.log(mel @ power + 2.0 ** -24)  # [n_mels, T]
    mean = feats.mean(dim=1, keepdim=True)
    std = feats.std(dim=1, keepdim=True) + 1e-5
    return ((feats - mean) / std).T  # [T, n_mels]


def kaldi_fbank_reference(wave, n_mels=80, sr=16000, n_fft=512,
                          win_length=400, hop_length=160):
    """kaldi-native-fbank as sherpa-onnx configures it
    (pkg/k2-asr/src/huggingface.py:79-80: 16 kHz, 80-dim): dither 0,
    snip_edges=False (frame t centered at t·hop + hop/2, kaldi symmetric
    edge reflection), per-frame DC removal, per-frame preemphasis 0.97
    (first sample against itself), povey window (hann^0.85), zero-pad to
    n_fft, power spectrum, HTK-mel-domain banks (fmin 20), log with
    float32-eps clamp, no feature normalization. wave: [N] ->
    torch [T, n_mels]."""
    x = torch.as_tensor(wave, dtype=torch.float32)
    n = x.shape[0]
    t_out = (n + hop_length // 2) // hop_length
    idx0 = np.arange(win_length)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * idx0 / (win_length - 1))
    povey = torch.from_numpy((hann ** 0.85).astype(np.float32))
    mel = kaldi_mel_banks(n_mels, n_fft, sr)
    eps = float(np.finfo(np.float32).eps)
    out = []
    for t in range(t_out):
        start = t * hop_length + hop_length // 2 - win_length // 2
        sidx = start + idx0
        # kaldi ExtractWindow reflection: s < 0 -> -s-1 ; s >= n -> 2n-1-s
        sidx = np.where(sidx < 0, -sidx - 1, sidx)
        sidx = np.where(sidx >= n, 2 * n - 1 - sidx, sidx)
        fr = x[torch.from_numpy(sidx)]
        fr = fr - fr.mean()
        fr = torch.cat([fr[:1] * (1.0 - 0.97), fr[1:] - 0.97 * fr[:-1]])
        fr = fr * povey
        spec = torch.fft.rfft(fr, n=n_fft)
        power = (spec.real ** 2 + spec.imag ** 2)[: n_fft // 2]
        out.append(torch.log(torch.clamp(mel @ power, min=eps)))
    return torch.stack(out)  # [T, n_mels]


def espnet_frontend_reference(wave, n_mels=80, sr=16000, n_fft=512,
                              win_length=400, hop_length=160):
    """ESPnet2 default frontend: torch.stft with periodic hann (centered
    reflect-pad), power spectrum, librosa slaney mel, natural log with
    1e-10 clamp. (GlobalMVN, when the model config carries one, is applied
    by the model conversion, not here.) wave: [N] -> torch [T, n_mels]."""
    x = torch.as_tensor(wave, dtype=torch.float32)
    window = torch.hann_window(win_length)  # periodic
    spec = torch.stft(x, n_fft=n_fft, hop_length=hop_length,
                      win_length=win_length, window=window, center=True,
                      return_complex=True)
    power = spec.real ** 2 + spec.imag ** 2  # [K, T]
    mel = slaney_mel_banks(n_mels, n_fft, sr)
    feats = torch.clamp(mel @ power, min=1e-10).log()
    return feats.T  # [T, n_mels]


# ---------------------------------------------------------------------------
# zipformer oracle
# ---------------------------------------------------------------------------


def _swoosh_l(x):
    return torch.logaddexp(torch.zeros_like(x), x - 4.0) - 0.08 * x - 0.035


def _swoosh_r(x):
    return torch.logaddexp(torch.zeros_like(x), x - 1.0) - 0.08 * x - 0.313


def _bias_norm(sd, p, x, eps=1e-5):
    bias = sd[f"{p}.bias"]
    rms = torch.sqrt(((x - bias) ** 2).mean(-1, keepdim=True) + eps)
    return x * (torch.exp(sd[f"{p}.log_scale"]) / rms)


def _bypass(sd, p, x_orig, x):
    c = sd[f"{p}.bypass_scale"].clamp(0.0, 1.0)
    return x_orig * (1.0 - c) + x * c


def _compact_rel_pos_t(t, pos_dim):
    rel = np.arange(t - 1, -t, -1, dtype=np.float64)
    compressed = np.sign(rel) * np.log1p(np.abs(rel))
    half = pos_dim // 2
    freqs = np.exp(np.arange(half, dtype=np.float64)
                   * (-math.log(100.0) / max(half - 1, 1)))
    ang = compressed[:, None] * freqs[None, :] * np.pi
    pe = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    return torch.from_numpy(pe[:, :pos_dim].astype(np.float32))


def _zip_rel_shift(x):
    """[H, T, 2T-1] -> [H, T, T]"""
    h, t, _ = x.shape
    idx = (torch.arange(t).view(t, 1) * -1 + (t - 1) + torch.arange(t).view(1, t))
    return x.gather(2, idx.view(1, t, t).expand(h, t, t))


def _zip_conv_module(sd, p, x, d):
    y = _lin(sd, f"{p}.in_proj", x)
    a, g = y[..., :d], y[..., d:]
    y = a * torch.sigmoid(g)
    dw = sd[f"{p}.depthwise_conv.weight"]
    y = F.conv1d(y.T[None], dw, sd.get(f"{p}.depthwise_conv.bias"),
                 padding=dw.shape[-1] // 2, groups=d)[0].T
    y = _swoosh_r(y)
    return _lin(sd, f"{p}.out_proj", y)


def _zip_layer(sd, p, x, pos_emb, h, qd, pd, vd, d):
    """One zipformer2 layer on [T, D] (single utterance, full length)."""
    t = x.shape[0]
    x_orig = x

    # shared attention weights, computed ONCE from the layer input
    qkp = _lin(sd, f"{p}.self_attn_weights.in_proj", x).view(t, h, 2 * qd + pd)
    q, k, qp = qkp[..., :qd], qkp[..., qd:2 * qd], qkp[..., 2 * qd:]
    pos = F.linear(pos_emb, sd[f"{p}.self_attn_weights.linear_pos.weight"])
    pos = pos.view(2 * t - 1, h, pd)
    scores = torch.einsum("thd,shd->hts", q, k)
    pos_scores = torch.einsum("thd,lhd->htl", qp, pos)
    scores = (scores + _zip_rel_shift(pos_scores)) / math.sqrt(qd)
    weights = torch.softmax(scores, dim=-1)  # [H, T, T]

    def self_attn(prefix, y):
        v = _lin(sd, f"{p}.{prefix}.in_proj", y).view(t, h, vd)
        out = torch.einsum("hts,shd->thd", weights, v).reshape(t, h * vd)
        return _lin(sd, f"{p}.{prefix}.out_proj", out)

    def nonlin(y):
        sxy = _lin(sd, f"{p}.nonlin_attention.in_proj", y)
        s, v, y2 = sxy.chunk(3, dim=-1)
        v = torch.tanh(s) * v
        attended = torch.einsum("ts,sd->td", weights[0], v)
        return _lin(sd, f"{p}.nonlin_attention.out_proj", attended * y2)

    def ffn(prefix, y):
        return _lin(sd, f"{p}.{prefix}.out_proj",
                    _swoosh_l(_lin(sd, f"{p}.{prefix}.in_proj", y)))

    x = x + ffn("feed_forward1", x)
    x = x + nonlin(x)
    x = x + self_attn("self_attn1", x)
    x = x + _zip_conv_module(sd, f"{p}.conv_module1", x, d)
    x = x + ffn("feed_forward2", x)
    x = _bypass(sd, f"{p}.bypass_mid", x_orig, x)
    x = x + self_attn("self_attn2", x)
    x = x + _zip_conv_module(sd, f"{p}.conv_module2", x, d)
    x = x + ffn("feed_forward3", x)
    x = _bias_norm(sd, f"{p}.norm", x)
    x = _bypass(sd, f"{p}.bypass", x_orig, x)
    return x


def zipformer_encoder_forward(sd, feats, cfg):
    """Zipformer2 encoder forward on [T, F] (single utterance, full length).

    Mirrors models/zipformer.py's architecture (this framework's reading of
    icefall zipformer2) directly on the icefall-named torch state dict — an
    independent cross-framework check of the converter's layout transforms
    and the JAX model's wiring. ``cfg`` is a ZipformerConfig (dims only; no
    JAX is touched).
    """
    x = feats[None, None]  # [1, 1, T, F]
    x = _swoosh_r(F.conv2d(x, sd["encoder_embed.conv.0.weight"],
                           sd["encoder_embed.conv.0.bias"], stride=(1, 2)))
    x = _swoosh_r(F.conv2d(x, sd["encoder_embed.conv.4.weight"],
                           sd["encoder_embed.conv.4.bias"], stride=(2, 2)))
    x = _swoosh_r(F.conv2d(x, sd["encoder_embed.conv.8.weight"],
                           sd["encoder_embed.conv.8.bias"], stride=(1, 1)))
    _, c, t, f = x.shape
    x = x.permute(0, 2, 1, 3).reshape(t, c * f)  # torch C-major flatten
    x = _lin(sd, "encoder_embed.out", x)
    x = _bias_norm(sd, "encoder_embed.out_norm", x)

    t1 = x.shape[0]
    qd, vd, pd = cfg.query_head_dim, cfg.value_head_dim, cfg.pos_head_dim
    stack_outputs = []
    for si in range(len(cfg.num_layers)):
        d = cfg.encoder_dim[si]
        # convert_num_channels
        if x.shape[-1] > d:
            x = x[..., :d]
        elif x.shape[-1] < d:
            x = F.pad(x, (0, d - x.shape[-1]))
        stack_in = x
        ds = cfg.downsampling[si]
        if ds > 1:
            t_out = -(-x.shape[0] // ds)
            pad = t_out * ds - x.shape[0]
            if pad:
                x = torch.cat([x, x[-1:].expand(pad, d)], dim=0)
            w = torch.softmax(sd[f"encoder.encoders.{si}.downsample.bias"], dim=0)
            x = torch.einsum("tsd,s->td", x.view(t_out, ds, d), w)
        pos_emb = _compact_rel_pos_t(x.shape[0], cfg.pos_dim)
        base = (f"encoder.encoders.{si}.encoder.layers" if ds > 1
                else f"encoder.encoders.{si}.layers")
        for j in range(cfg.num_layers[si]):
            x = _zip_layer(sd, f"{base}.{j}", x, pos_emb,
                           cfg.num_heads[si], qd, pd, vd, d)
        if ds > 1:
            x = x.repeat_interleave(ds, dim=0)[:t1]
            x = _bypass(sd, f"encoder.encoders.{si}.bypass", stack_in, x)
        stack_outputs.append(x)

    pieces = [stack_outputs[-1]]
    cur = cfg.encoder_dim[-1]
    for si in range(len(stack_outputs) - 2, -1, -1):
        d = cfg.encoder_dim[si]
        if d > cur:
            pieces.append(stack_outputs[si][..., cur:d])
            cur = d
    out = torch.cat(pieces, dim=-1)

    ods = cfg.output_downsampling
    if ods > 1:
        t = out.shape[0]
        t_out = -(-t // ods)
        pad = t_out * ods - t
        if pad:
            out = torch.cat([out, out[-1:].expand(pad, out.shape[-1])], dim=0)
        out = out.view(t_out, ods, -1).mean(dim=1)
    return out


# ---------------------------------------------------------------------------
# AVHuBERT oracle
# ---------------------------------------------------------------------------


def _strip_model_prefix(sd):
    return {(k[6:] if k.startswith("model.") else k): v for k, v in sd.items()}


def _pos_conv_weight(sd):
    """Reconstruct the weight-normalized positional conv weight (dim=2)."""
    pc = "encoder.pos_conv_embed.conv"
    if f"{pc}.weight_v" in sd:
        g, v = sd[f"{pc}.weight_g"], sd[f"{pc}.weight_v"]
    elif f"{pc}.parametrizations.weight.original1" in sd:
        g = sd[f"{pc}.parametrizations.weight.original0"]
        v = sd[f"{pc}.parametrizations.weight.original1"]
    else:
        return sd[f"{pc}.weight"]
    norm = v.pow(2).sum(dim=(0, 1), keepdim=True).sqrt()
    return g * v / norm.clamp_min(1e-12)


def avhubert_encoder_forward(sd, cfg, audio=None, video_feat=None):
    """AVHuBERT encoder on [T, audio_feat_dim] (audio-only path; the video
    branch's ResNet is covered by conv3d/conv2d primitive parity and
    ``video_feat`` may inject a precomputed [T, 512] trunk output).

    Mirrors the HF Hubert stable-layer-norm encoder with the AVSR fusion
    front (pkg/avsr/src/avhubert/modeling_avhubert.py:130-210): linear
    feature projections, zeros for the missing modality, concat fusion,
    fused layer_norm, post-projection, weight-normalized grouped positional
    conv (pad K//2, trim for even K, GELU), pre-LN blocks, final LN.
    """
    sd = _strip_model_prefix(sd)
    t = (audio if audio is not None else video_feat).shape[0]
    a = (_lin(sd, "feature_extractor_audio.proj", audio)
         if audio is not None else None)
    v = (_lin(sd, "feature_extractor_video.proj", video_feat)
         if video_feat is not None else None)
    if a is None:
        a = torch.zeros_like(v)
    if v is None:
        v = torch.zeros_like(a)
    x = torch.cat([a, v], dim=-1) if cfg.modality_fuse == "concat" else a + v
    x = _ln(sd, "layer_norm", x)
    if "post_extract_proj.weight" in sd:
        x = _lin(sd, "post_extract_proj", x)

    w = _pos_conv_weight(sd)  # [out, in/g, K]
    k = w.shape[-1]
    pos = F.conv1d(
        x.T[None], w, sd.get("encoder.pos_conv_embed.conv.bias"),
        padding=k // 2, groups=cfg.num_conv_pos_embedding_groups,
    )[0].T
    if k % 2 == 0:
        pos = pos[:-1]
    x = x + F.gelu(pos)

    h = cfg.num_attention_heads
    d = cfg.hidden_size
    dh = d // h
    for n in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{n}"
        y = _ln(sd, f"{p}.layer_norm", x)
        q = _lin(sd, f"{p}.attention.q_proj", y).view(t, h, dh)
        kk = _lin(sd, f"{p}.attention.k_proj", y).view(t, h, dh)
        vv = _lin(sd, f"{p}.attention.v_proj", y).view(t, h, dh)
        scores = torch.einsum("qhd,khd->hqk", q, kk) / math.sqrt(dh)
        probs = torch.softmax(scores, dim=-1)
        o = torch.einsum("hqk,khd->qhd", probs, vv).reshape(t, d)
        x = x + _lin(sd, f"{p}.attention.out_proj", o)
        y = _ln(sd, f"{p}.final_layer_norm", x)
        y = _lin(sd, f"{p}.feed_forward.output_dense",
                 F.gelu(_lin(sd, f"{p}.feed_forward.intermediate_dense", y)))
        x = x + y
    return _ln(sd, "encoder.layer_norm", x)


def _avhubert_dec_sinusoid(t, d):
    pos = np.arange(t, dtype=np.float64)
    half = d // 2
    inv = np.exp(np.arange(half, dtype=np.float64)
                 * (-math.log(10000.0) / max(half - 1, 1)))
    ang = pos[:, None] * inv[None, :]
    pe = np.zeros((t, d), np.float32)
    pe[:, 0:half] = np.sin(ang)
    pe[:, half:2 * half] = np.cos(ang)
    return torch.from_numpy(pe)


def avhubert_decoder_logits(sd, cfg, tokens, enc):
    """Teacher-forced decoder logits for token ids [U] against enc [T, D]."""
    sd = _strip_model_prefix(sd)
    u = len(tokens)
    dd = cfg.decoder_hidden_size
    h = cfg.decoder_attention_heads
    dh = dd // h
    emb = sd["decoder.embed_tokens.weight"][torch.as_tensor(tokens)]
    x = emb * math.sqrt(dd) + _avhubert_dec_sinusoid(u, dd)
    causal = torch.tril(torch.ones(u, u, dtype=torch.bool))
    for n in range(cfg.decoder_layers):
        p = f"decoder.layers.{n}"
        y = _ln(sd, f"{p}.self_attn_layer_norm", x)
        q = _lin(sd, f"{p}.self_attn.q_proj", y).view(u, h, dh)
        k = _lin(sd, f"{p}.self_attn.k_proj", y).view(u, h, dh)
        v = _lin(sd, f"{p}.self_attn.v_proj", y).view(u, h, dh)
        s = torch.einsum("qhd,khd->hqk", q, k) / math.sqrt(dh)
        s = s.masked_fill(~causal[None], float("-inf"))
        o = torch.einsum("hqk,khd->qhd", torch.softmax(s, -1), v).reshape(u, dd)
        x = x + _lin(sd, f"{p}.self_attn.out_proj", o)
        y = _ln(sd, f"{p}.encoder_attn_layer_norm", x)
        q = _lin(sd, f"{p}.encoder_attn.q_proj", y).view(u, h, dh)
        k = _lin(sd, f"{p}.encoder_attn.k_proj", enc).view(-1, h, dh)
        v = _lin(sd, f"{p}.encoder_attn.v_proj", enc).view(-1, h, dh)
        s = torch.einsum("qhd,khd->hqk", q, k) / math.sqrt(dh)
        o = torch.einsum("hqk,khd->qhd", torch.softmax(s, -1), v).reshape(u, dd)
        x = x + _lin(sd, f"{p}.encoder_attn.out_proj", o)
        y = _ln(sd, f"{p}.final_layer_norm", x)
        y = _lin(sd, f"{p}.fc2", F.gelu(_lin(sd, f"{p}.fc1", y)))
        x = x + y
    x = _ln(sd, "decoder.layer_norm", x)
    if cfg.tie_word_embeddings:
        return x @ sd["decoder.embed_tokens.weight"].T
    return F.linear(x, sd["lm_head.weight"])


def avhubert_greedy_reference(sd, cfg, enc, max_length=16):
    """Greedy seq2seq decode via repeated teacher forcing (oracle-simple)."""
    tokens = [cfg.bos_token_id]
    with torch.no_grad():
        for _ in range(max_length - 1):
            logits = avhubert_decoder_logits(sd, cfg, tokens, enc)
            nxt = int(torch.argmax(logits[-1]))
            tokens.append(nxt)
            if nxt == cfg.eos_token_id:
                break
    return tokens


def avhubert_beam_reference(sd, cfg, enc, num_beams=5, max_length=16,
                            length_penalty=1.0):
    """Beam search with HF ``GenerationMixin``/``BeamSearchScorer`` semantics
    (what the reference's ``model.generate(num_beams=5)`` runs,
    pkg/avsr/src/avhubert/modeling_avhubert.py:330-370 + transformers
    beam_search): per step the top 2·beam candidates are processed in rank
    order — an EOS candidate (rank < beam only) banks the running hypothesis
    into a worst-replaced pool of size ``beam``, scored
    sum_logprobs / len^length_penalty (len counts the decoder-start token,
    not the EOS); the first ``beam`` non-EOS candidates become the next
    beams. early_stopping=False: the search ends when the pool is full and
    its worst entry beats best_running / (cur_len+1)^penalty, else at
    max_length, where the surviving beams are banked too. Decode is via
    repeated teacher forcing (oracle-simple). Returns the best hypothesis's
    token list incl. leading bos (and trailing EOS when one was emitted)."""
    k = num_beams
    beams = [[cfg.bos_token_id]]
    beam_scores = [0.0]
    pool = []  # (norm_score, tokens, emitted_eos)

    def pool_add(tokens, sum_logprobs, emitted_eos):
        score = sum_logprobs / (len(tokens) ** length_penalty)
        if len(pool) < k:
            pool.append((score, tokens, emitted_eos))
        elif score > min(p[0] for p in pool):
            pool.remove(min(pool, key=lambda p: p[0]))
            pool.append((score, tokens, emitted_eos))

    ended = False
    with torch.no_grad():
        while len(beams[0]) < max_length:
            cand = []
            for b_i, (bm, bs) in enumerate(zip(beams, beam_scores)):
                logp = F.log_softmax(
                    avhubert_decoder_logits(sd, cfg, bm, enc)[-1], dim=-1)
                for tok, lp in enumerate(logp.tolist()):
                    cand.append((bs + lp, b_i, tok))
            cand.sort(key=lambda c: c[0], reverse=True)
            next_beams, next_scores = [], []
            for rank, (sc, b_i, tok) in enumerate(cand[: 2 * k]):
                if tok == cfg.eos_token_id:
                    if rank < k:
                        pool_add(list(beams[b_i]), sc, True)
                else:
                    next_beams.append(beams[b_i] + [tok])
                    next_scores.append(sc)
                if len(next_beams) == k:
                    break
            cur_len = len(beams[0]) + 1
            beams, beam_scores = next_beams, next_scores
            if len(pool) >= k and (
                min(p[0] for p in pool)
                >= cand[0][0] / (cur_len ** length_penalty)
            ):
                ended = True
                break
        if not ended:
            for bm, bs in zip(beams, beam_scores):
                pool_add(list(bm), bs, False)
    best = max(pool, key=lambda p: p[0])
    out = list(best[1])
    if best[2] and len(out) < max_length:
        out.append(cfg.eos_token_id)
    return out
