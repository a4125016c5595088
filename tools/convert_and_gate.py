"""Convert published checkpoints and GATE the result against a torch oracle.

VERDICT.md round-1 item 1: until weights flow through the converters and the
JAX pipeline reproduces the torch reference token-for-token, the stack is
unproven. This tool closes that loop for whatever checkpoints are available:

  stage 1  convert the container (.nemo tar / espnet-zoo / sherpa k2 repo)
           through the production converters (the same code load_model uses);
  stage 2  ENCODER LOGIT PARITY: identical features through the torch oracle
           (tools/torch_reference.py, independent reimplementation of the
           published architectures) and our JAX encoder; gate max|Δ|/rel-Δ;
  stage 3  TOKEN PARITY: full oracle pipeline vs full JAX pipeline,
           token-for-token (both from their own encoder outputs for
           nemo/espnet; shared encoder output for k2, whose torch-side
           encoder oracle does not exist — the ONNX/pt converters are gated
           structurally + by decoder/joiner token parity). Covers BOTH the
           greedy path and the reference's serving beam: NeMo ALSD
           (alsd_beam_token_match, beam 4) for nemo and ESPnet
           default_beam_search (beam20_token_match, beam 20) for espnet,
           each against its serial oracle;
  stage 3b WAVEFORM-IN PARITY: synthetic waveforms through the oracle
           frontends (torch.stft NeMo preprocessor / kaldi-native-fbank
           semantics / espnet STFT+LogMel — independent implementations in
           torch_reference.py) + oracle encoder + oracle greedy, vs our
           frontend + encoder + greedy: wave_feature_mae and
           wave_token_match gate the frontends end-to-end (VERDICT r2
           item 2);
  stage 4  BF16-RESIDUAL CHECK: our pipeline with residual_dtype=float32 vs
           bfloat16 — token flip rate decides whether the serving default
           keeps bf16 (VERDICT item "What's missing" 4);
  stage 5  LND-SERVING CHECK (nemo): the full Pallas serving config (fused-LN
           projections via ops/ln_dense.py, packed qkv attention, in-kernel
           conv LN) — token flips measured against the FP32 pipeline's
           tokens, side by side with the XLA-bf16 baseline's own flips vs
           fp32. Gates the lnd_impl="pallas" serving default: lnd must not
           deviate from fp32 truth more than xla-bf16 already does.
           (Measured on fixtures: xla-bf16 flips 78%, lnd flips 0% — the
           in-kernel fp32 LN/swish/bias keep lnd CLOSER to fp32.)

Without egress, `--fixtures` fabricates faithful containers with random
weights (tests/fixture_checkpoints.py): wiring/layout errors are exactly as
visible with random weights as with trained ones. Point --nemo/--espnet/--k2
at real downloads to run the same gates on published weights.

Writes PARITY_GATE.json and exits non-zero on gate failure.

Usage:
  python tools/convert_and_gate.py --fixtures [--size tiny|small] [--out PARITY_GATE.json]
  python tools/convert_and_gate.py --nemo path/to/model.nemo
  python tools/convert_and_gate.py --espnet path/to/zoo_dir --k2 path/to/repo_dir
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__)))

import numpy as np

# thresholds: fp32 end-to-end through ~10 orders of elementwise ops
ENC_MAE_TOL = 2e-4
ENC_REL_TOL = 2e-3
TOKEN_MATCH_MIN = 0.99
# bf16 residual: require <2% token flips for the serving default to keep it
BF16_FLIP_MAX = 0.02
# with random weights both decoders saturate their (different) emission caps,
# which is cap-shape comparison, not semantics; cap both at 1 symbol/frame
MAX_SYMBOLS = 1
# ALSD beam width gated for the nemo flavor (the serving default; NeMo's
# RNNTDecodingConfig beam default — tools/run_real_parity.py re-checks the
# published model's decoding section)
ALSD_BEAM = 4
# ESPnet Speech2Text default beam width (the espnet serving default)
ESPNET_BEAM = 20
# waveform-in feature parity (log-mel values; fp32 torch.stft vs block-DFT)
WAVE_FEAT_MAE_TOL = 1e-4


def _interpret_kernels_on_cpu():
    """Route the serving Pallas kernels through interpret mode when the gate
    runs off-TPU (fixtures under pytest); on a real chip they run natively.
    Shared kernel registry: reazonspeech_tpu/ops/testing.py."""
    from reazonspeech_tpu.ops.testing import interpret_serving_kernels

    return interpret_serving_kernels(only_off_tpu=True)


def _mel_clips(n_clips, t, feat, seed=0):
    """Speech-shaped log-mel-like features (band-limited, correlated)."""
    rng = np.random.default_rng(seed)
    clips = []
    for _ in range(n_clips):
        x = rng.standard_normal((t + 16, feat)).astype(np.float32)
        # smooth over time to mimic real spectrogram correlation
        k = np.hanning(9).astype(np.float32)
        k /= k.sum()
        x = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), 0, x)
        clips.append(x[:t] * 2.0)
    return clips


def _wave_clips(n_clips, seconds, seed=0):
    """Speech-shaped synthetic waveforms: AM-modulated tones + noise floor
    (band-limited energy, realistic dynamic range for the log-mel chain)."""
    rng = np.random.default_rng(seed)
    n = int(seconds * 16000)
    t = np.arange(n) / 16000.0
    clips = []
    for _ in range(n_clips):
        x = 0.02 * rng.standard_normal(n)
        for _ in range(4):
            f0 = rng.uniform(120.0, 2600.0)
            am = rng.uniform(1.0, 6.0)
            x = x + (
                rng.uniform(0.05, 0.3)
                * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 6))
                * (1 + 0.6 * np.sin(2 * np.pi * am * t + rng.uniform(0, 6)))
            )
        clips.append(x.astype(np.float32))
    return clips


def _decode(jparams, enc, lens, rnnt_cfg):
    import numpy as np

    from reazonspeech_tpu.decoding.rnnt_greedy import (
        GreedyDecodeConfig,
        rnnt_greedy_decode,
    )

    toks, _, counts = rnnt_greedy_decode(
        jparams["predictor"], jparams["joint"], enc, lens, rnnt_cfg,
        GreedyDecodeConfig(max_symbols_per_step=MAX_SYMBOLS),
    )
    return np.asarray(toks)[0, : int(np.asarray(counts)[0])].tolist()


def _match_rate(a, b):
    if not a and not b:
        return 1.0
    n = max(len(a), len(b))
    same = sum(1 for x, y in zip(a, b) if x == y)
    return same / n


def gate_nemo(nemo_path, size, report):
    import jax
    import jax.numpy as jnp
    import torch

    from reazonspeech_tpu.convert.nemo_fastconformer import (
        convert_nemo_checkpoint,
        read_nemo_tar,
    )
    from reazonspeech_tpu.decoding.rnnt_beam import BeamDecodeConfig, rnnt_beam_decode
    from reazonspeech_tpu.decoding.rnnt_greedy import GreedyDecodeConfig, rnnt_greedy_decode
    from reazonspeech_tpu.models.fastconformer import fastconformer_encode
    from torch_reference import (
        nemo_encoder_forward,
        rnnt_alsd_reference,
        rnnt_greedy_reference,
    )

    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "converted")
        params, enc_cfg, rnnt_cfg = convert_nemo_checkpoint(nemo_path, out)
        sd, _, _ = read_nemo_tar(nemo_path)
    sd = {k: v.float() for k, v in sd.items()}
    from dataclasses import replace

    enc_cfg = replace(enc_cfg, compute_dtype="float32", attn_impl="xla",
                      residual_dtype="float32")
    rnnt_cfg = replace(rnnt_cfg, compute_dtype="float32")
    jparams = jax.tree.map(jnp.asarray, params)

    t = 256 if size != "tiny" else 64
    clips = _mel_clips(4, t, enc_cfg.feat_in)
    maes, rels, token_rates, alsd_rates = [], [], [], []
    alsd_fused_rates = []
    flips, devs = [], []
    lnd_flips, lnd_devs, base_bf_flips = [], [], []
    for i, mel in enumerate(clips):
        with torch.no_grad():
            ref_enc = nemo_encoder_forward(
                sd, torch.from_numpy(mel)[None], enc_cfg.num_layers,
                enc_cfg.num_heads, enc_cfg.d_model,
            ).numpy()[0]
        lens = jnp.array([mel.shape[0]])
        ours, olens = fastconformer_encode(
            jparams["encoder"], jnp.asarray(mel)[None], lens, enc_cfg
        )
        ours = np.asarray(ours)[0, : ref_enc.shape[0]]
        mae = float(np.abs(ours - ref_enc).mean())
        rel = float(np.abs(ours - ref_enc).max() / (np.abs(ref_enc).max() + 1e-9))
        maes.append(mae)
        rels.append(rel)

        ref_tokens, _ = rnnt_greedy_reference(
            sd, torch.from_numpy(ref_enc), rnnt_cfg.vocab_size,
            rnnt_cfg.pred_rnn_layers, rnnt_cfg.joint_activation,
            max_symbols=MAX_SYMBOLS,
        )
        toks, frames, counts = rnnt_greedy_decode(
            jparams["predictor"], jparams["joint"],
            jnp.asarray(ours)[None], olens, rnnt_cfg,
            GreedyDecodeConfig(max_symbols_per_step=MAX_SYMBOLS),
        )
        our_tokens = np.asarray(toks)[0, : int(np.asarray(counts)[0])].tolist()
        token_rates.append(_match_rate(ref_tokens, our_tokens))

        # ALSD beam (the reference's serving decode strategy): serial torch
        # oracle vs the batched fixed-shape JAX beam, token AND frame exact.
        ref_b = rnnt_alsd_reference(
            sd, torch.from_numpy(ref_enc), rnnt_cfg.vocab_size,
            beam_size=ALSD_BEAM, pred_rnn_layers=rnnt_cfg.pred_rnn_layers,
            joint_activation=rnnt_cfg.joint_activation,
        )
        btoks, bframes, bcounts, _ = rnnt_beam_decode(
            jparams["predictor"], jparams["joint"],
            jnp.asarray(ours)[None], olens, rnnt_cfg,
            BeamDecodeConfig(beam_size=ALSD_BEAM),
        )
        bc = int(np.asarray(bcounts)[0])
        our_b = list(zip(np.asarray(btoks)[0, :bc].tolist(),
                         np.asarray(bframes)[0, :bc].tolist()))
        ref_bpairs = list(zip(ref_b[0], ref_b[1]))
        alsd_rates.append(_match_rate(ref_bpairs, our_b))

        # Fused decode-step kernels (ops/lstm_step.py + beam_topk.joint_topm,
        # opt-in joint_impl/lstm_impl="pallas", fp32 in-kernel): gate them
        # against the SAME serial oracle pairs as the serving chain.
        with _interpret_kernels_on_cpu():
            ftoks, fframes, fcounts, _ = rnnt_beam_decode(
                jparams["predictor"], jparams["joint"],
                jnp.asarray(ours)[None], olens, rnnt_cfg,
                BeamDecodeConfig(beam_size=ALSD_BEAM, joint_impl="pallas",
                                 lstm_impl="pallas"),
            )
        fc = int(np.asarray(fcounts)[0])
        our_f = list(zip(np.asarray(ftoks)[0, :fc].tolist(),
                         np.asarray(fframes)[0, :fc].tolist()))
        alsd_fused_rates.append(_match_rate(ref_bpairs, our_f))

        # bf16-RESIDUAL sensitivity. Serving always computes matmuls in bf16
        # (MXU); the open question is the residual stream dtype, so compare
        # bf16-compute/fp32-residual (baseline) vs bf16-compute/bf16-residual.
        base_cfg = replace(enc_cfg, compute_dtype="bfloat16")
        bf_cfg = replace(base_cfg, residual_dtype="bfloat16")
        enc_base, lens_b = fastconformer_encode(
            jparams["encoder"], jnp.asarray(mel)[None], lens, base_cfg
        )
        enc_bf, _ = fastconformer_encode(
            jparams["encoder"], jnp.asarray(mel)[None], lens, bf_cfg
        )
        dev = float(np.abs(np.asarray(enc_bf) - np.asarray(enc_base)).max()
                    / (np.abs(np.asarray(enc_base)).max() + 1e-9))
        devs.append(dev)
        base_toks = _decode(jparams, enc_base, lens_b, rnnt_cfg)
        bf_toks = _decode(jparams, enc_bf, lens_b, rnnt_cfg)
        flips.append(1.0 - _match_rate(base_toks, bf_toks))

        # LND-SERVING sensitivity: the full Pallas serving config (fused-LN
        # projections, packed qkv attention, in-kernel conv LN — all bf16
        # compute, fp32 residual). The reference point is the FP32 pipeline's
        # tokens, not the XLA-bf16 baseline: with random weights ANY
        # bf16-level perturbation flips tokens chaotically (the XLA bf16 path
        # itself flips ~78% vs fp32 here), so the gate asks whether lnd
        # serving deviates from fp32 truth MORE than xla-bf16 already does.
        # (Measured: lnd 0% vs fp32 — its in-kernel fp32 LN/swish/bias keep
        # it closer to fp32 than the XLA bf16 chain.)
        serve_cfg = replace(base_cfg, attn_impl="pallas", conv_impl="pallas",
                            lnd_impl="pallas")
        with _interpret_kernels_on_cpu():
            enc_lnd, lens_l = fastconformer_encode(
                jparams["encoder"], jnp.asarray(mel)[None], lens, serve_cfg
            )
        lnd_devs.append(
            float(np.abs(np.asarray(enc_lnd) - np.asarray(enc_base)).max()
                  / (np.abs(np.asarray(enc_base)).max() + 1e-9)))
        lnd_toks = _decode(jparams, enc_lnd, lens_l, rnnt_cfg)
        base_bf_flips.append(1.0 - _match_rate(our_tokens, base_toks))
        lnd_flips.append(1.0 - _match_rate(our_tokens, lnd_toks))

    # WAVEFORM-IN stage: synthetic waveforms through the oracle preprocessor
    # (torch.stft chain) + oracle encoder + oracle greedy, vs our frontend +
    # encoder + greedy — end-to-end from audio samples, closing the mel-in
    # blind spot (VERDICT r2 item 2).
    from reazonspeech_tpu.frontend.features import (
        log_mel_spectrogram,
        nemo_frontend_config,
    )
    from torch_reference import nemo_preprocessor_reference

    fe_cfg = nemo_frontend_config(n_mels=enc_cfg.feat_in)
    wave_feat_maes, wave_rates = [], []
    for w in _wave_clips(2, 2.1 if size == "tiny" else 4.2, seed=3):
        with torch.no_grad():
            ref_feats = nemo_preprocessor_reference(
                w, n_mels=enc_cfg.feat_in).numpy()
            ref_enc = nemo_encoder_forward(
                sd, torch.from_numpy(ref_feats)[None], enc_cfg.num_layers,
                enc_cfg.num_heads, enc_cfg.d_model,
            ).numpy()[0]
            ref_tokens, _ = rnnt_greedy_reference(
                sd, torch.from_numpy(ref_enc), rnnt_cfg.vocab_size,
                rnnt_cfg.pred_rnn_layers, rnnt_cfg.joint_activation,
                max_symbols=MAX_SYMBOLS,
            )
        feats, flens = log_mel_spectrogram(
            jnp.asarray(w)[None], jnp.array([len(w)]), fe_cfg)
        fv = np.asarray(feats)[0, : int(flens[0])]
        wave_feat_maes.append(
            float(np.abs(fv[: ref_feats.shape[0]] - ref_feats).mean()))
        enc_w, elens_w = fastconformer_encode(
            jparams["encoder"], feats, flens, enc_cfg)
        toks, _, counts = rnnt_greedy_decode(
            jparams["predictor"], jparams["joint"], enc_w, elens_w, rnnt_cfg,
            GreedyDecodeConfig(max_symbols_per_step=MAX_SYMBOLS),
        )
        our_tokens = np.asarray(toks)[0, : int(np.asarray(counts)[0])].tolist()
        wave_rates.append(_match_rate(ref_tokens, our_tokens))

    entry = {
        "encoder_logit_mae": max(maes),
        "encoder_logit_rel": max(rels),
        "token_match_vs_torch": min(token_rates),
        "alsd_beam_token_match": min(alsd_rates),
        "alsd_fused_impls_token_match": min(alsd_fused_rates),
        "wave_feature_mae": max(wave_feat_maes),
        "wave_token_match": min(wave_rates),
        "bf16_residual_token_flip_rate": max(flips),
        "bf16_residual_enc_rel_dev": max(devs),
        "xla_bf16_token_flip_vs_fp32": max(base_bf_flips),
        "lnd_token_flip_vs_fp32": max(lnd_flips),
        "lnd_enc_rel_dev": max(lnd_devs),
        "pass": bool(
            max(maes) < ENC_MAE_TOL
            and max(rels) < ENC_REL_TOL
            and min(token_rates) >= TOKEN_MATCH_MIN
            and min(alsd_rates) >= TOKEN_MATCH_MIN
            and max(wave_feat_maes) < WAVE_FEAT_MAE_TOL
            and min(wave_rates) >= TOKEN_MATCH_MIN
        ),
        "bf16_serving_ok": bool(max(flips) <= BF16_FLIP_MAX),
        "lnd_serving_ok": bool(
            max(lnd_flips) <= max(base_bf_flips) + BF16_FLIP_MAX),
    }
    report["nemo"] = entry
    return entry["pass"]


def gate_espnet(zoo_dir, size, report):
    import glob

    import jax
    import jax.numpy as jnp
    import torch

    from reazonspeech_tpu.convert.espnet_conformer import convert_espnet_checkpoint
    from reazonspeech_tpu.decoding.rnnt_greedy import GreedyDecodeConfig, rnnt_greedy_decode
    from reazonspeech_tpu.models.conformer import ctc_log_softmax
    from reazonspeech_tpu.models.fastconformer import fastconformer_encode
    from reazonspeech_tpu.models.rnnt import RNNTConfig
    from reazonspeech_tpu.decoding.transducer_graves import (
        GravesBeamConfig,
        graves_beam_decode,
    )
    from torch_reference import (
        espnet_ctc_log_softmax,
        espnet_default_beam_reference,
        espnet_encoder_forward,
        rnnt_greedy_reference,
    )

    pths = sorted(glob.glob(os.path.join(zoo_dir, "**", "*.pth"), recursive=True))
    cfgs = glob.glob(os.path.join(os.path.dirname(pths[0]), "config.yaml"))
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "converted")
        params, enc_cfg = convert_espnet_checkpoint(
            pths[0], out, config_yaml=cfgs[0] if cfgs else None
        )
        from reazonspeech_tpu.convert.store import load_param_tree

        _, meta = load_param_tree(out)
    sd = {k: v.float() for k, v in
          __import__("torch").load(pths[0], map_location="cpu", weights_only=True).items()}
    from dataclasses import replace

    enc_cfg = replace(enc_cfg, compute_dtype="float32", attn_impl="xla",
                      residual_dtype="float32")
    rnnt_cfg = RNNTConfig(**meta["rnnt_cfg"]) if meta.get("rnnt_cfg") else None
    if rnnt_cfg is not None:
        rnnt_cfg = replace(rnnt_cfg, compute_dtype="float32")
    jparams = jax.tree.map(jnp.asarray, params)

    t = 256 if size != "tiny" else 64
    clips = _mel_clips(4, t, enc_cfg.feat_in, seed=1)
    maes, rels, ctc_maes, token_rates, beam_rates = [], [], [], [], []
    beam_fused_rates = []
    align_drifts = []
    flips, devs = [], []
    for mel in clips:
        with torch.no_grad():
            ref_enc = espnet_encoder_forward(
                sd, torch.from_numpy(mel)[None], enc_cfg.num_layers,
                enc_cfg.num_heads, enc_cfg.d_model,
            )
            ref_lpz = espnet_ctc_log_softmax(sd, ref_enc).numpy()[0]
            ref_enc = ref_enc.numpy()[0]
        lens = jnp.array([mel.shape[0]])
        ours, olens = fastconformer_encode(
            jparams["encoder"], jnp.asarray(mel)[None], lens, enc_cfg
        )
        ours_np = np.asarray(ours)[0, : ref_enc.shape[0]]
        maes.append(float(np.abs(ours_np - ref_enc).mean()))
        rels.append(float(np.abs(ours_np - ref_enc).max()
                          / (np.abs(ref_enc).max() + 1e-9)))
        lpz = np.asarray(ctc_log_softmax(jparams["ctc"], ours))[0, : ref_lpz.shape[0]]
        ctc_maes.append(float(np.abs(lpz - ref_lpz).mean()))

        # CTC forced-alignment timing parity (VERDICT r3 #2): the production
        # Viterbi aligner vs the CTC-segmentation paper's DP
        # (tools/ctc_segmentation_oracle.py — the published algorithm behind
        # the C extension the reference calls, pkg/espnet-asr/src/ctc.py:60-72)
        # on this model's REAL CTC posteriors; tokens = the collapsed greedy
        # CTC path, so the alignment is defined by the matrix itself.
        import itertools

        from ctc_segmentation_oracle import ctc_segmentation_align

        from reazonspeech_tpu.decoding.ctc import ctc_viterbi_align

        ids = np.argmax(lpz, axis=1)
        toks_seq = np.asarray(
            [kk_ for kk_, _ in itertools.groupby(ids) if kk_ != 0], np.int64)
        if toks_seq.size >= 2:
            got_fr = ctc_viterbi_align(lpz, toks_seq)
            want_fr, want_lp = ctc_segmentation_align(lpz, toks_seq)
            if got_fr.size and want_fr.size and np.isfinite(want_lp):
                align_drifts.append(int(np.max(
                    np.abs(got_fr.astype(int) - want_fr.astype(int)))))

        if rnnt_cfg is not None:
            ref_tokens, _ = rnnt_greedy_reference(
                sd, torch.from_numpy(ref_enc), rnnt_cfg.vocab_size,
                rnnt_cfg.pred_rnn_layers, rnnt_cfg.joint_activation,
                prefix="decoder", joint_prefix="joint_network",
                blank_first=True, max_symbols=MAX_SYMBOLS,
            )
            toks, _, counts = rnnt_greedy_decode(
                jparams["predictor"], jparams["joint"],
                jnp.asarray(ours_np)[None], olens, rnnt_cfg,
                GreedyDecodeConfig(max_symbols_per_step=MAX_SYMBOLS),
            )
            our_tokens = np.asarray(toks)[0, : int(np.asarray(counts)[0])].tolist()
            token_rates.append(_match_rate(ref_tokens, our_tokens))

            # ESPnet default beam search (the reference's serving decode,
            # Speech2Text beam 20): serial oracle vs the batched fixed-shape
            # Graves beam, token AND frame exact (same bounds on both sides)
            kk = min(ESPNET_BEAM, rnnt_cfg.vocab_size)
            gcfg = GravesBeamConfig(beam_size=ESPNET_BEAM)
            ref_b = espnet_default_beam_reference(
                sd, torch.from_numpy(ref_enc), rnnt_cfg.vocab_size,
                beam_size=ESPNET_BEAM, max_pops_per_frame=6 * kk + 8,
                kept_capacity=kk + 12, max_tokens=ref_enc.shape[0],
                pred_rnn_layers=rnnt_cfg.pred_rnn_layers,
                joint_activation=rnnt_cfg.joint_activation,
            )
            gt_, gf_, gc_, _, _ = graves_beam_decode(
                jparams["predictor"], jparams["joint"],
                jnp.asarray(ours_np)[None], olens, rnnt_cfg, gcfg,
            )
            gcn = int(np.asarray(gc_)[0])
            our_gb = list(zip(np.asarray(gt_)[0, :gcn].tolist(),
                              np.asarray(gf_)[0, :gcn].tolist()))
            beam_rates.append(_match_rate(list(zip(ref_b[0], ref_b[1])), our_gb))

            # fused decode-step kernels (opt-in joint_impl/lstm_impl) vs
            # the same serial oracle pairs
            with _interpret_kernels_on_cpu():
                ft_, ff_, fc_, _, _ = graves_beam_decode(
                    jparams["predictor"], jparams["joint"],
                    jnp.asarray(ours_np)[None], olens, rnnt_cfg,
                    replace(gcfg, joint_impl="pallas", lstm_impl="pallas"),
                )
            fcn = int(np.asarray(fc_)[0])
            our_fb = list(zip(np.asarray(ft_)[0, :fcn].tolist(),
                              np.asarray(ff_)[0, :fcn].tolist()))
            beam_fused_rates.append(
                _match_rate(list(zip(ref_b[0], ref_b[1])), our_fb))

            base_cfg = replace(enc_cfg, compute_dtype="bfloat16")
            bf_cfg = replace(base_cfg, residual_dtype="bfloat16")
            enc_base, lens_b = fastconformer_encode(
                jparams["encoder"], jnp.asarray(mel)[None], lens, base_cfg
            )
            enc_bf, _ = fastconformer_encode(
                jparams["encoder"], jnp.asarray(mel)[None], lens, bf_cfg
            )
            devs.append(float(
                np.abs(np.asarray(enc_bf) - np.asarray(enc_base)).max()
                / (np.abs(np.asarray(enc_base)).max() + 1e-9)))
            base_toks = _decode(jparams, enc_base, lens_b, rnnt_cfg)
            bf_toks = _decode(jparams, enc_bf, lens_b, rnnt_cfg)
            flips.append(1.0 - _match_rate(base_toks, bf_toks))

    # WAVEFORM-IN stage (same structure as gate_nemo's)
    from reazonspeech_tpu.frontend.features import (
        espnet_frontend_config,
        log_mel_spectrogram,
    )
    from torch_reference import espnet_frontend_reference

    fe_cfg = espnet_frontend_config(n_mels=enc_cfg.feat_in)
    mvn = params.get("normalize")
    wave_feat_maes, wave_rates = [], []
    for w in _wave_clips(2, 2.1 if size == "tiny" else 4.2, seed=4):
        with torch.no_grad():
            ref_feats = espnet_frontend_reference(
                w, n_mels=enc_cfg.feat_in).numpy()
            ref_in = ref_feats
            if mvn is not None:  # GlobalMVN — both sides normalize
                ref_in = (ref_feats - np.asarray(mvn["mean"])) / np.asarray(
                    mvn["std"])
            ref_enc = espnet_encoder_forward(
                sd, torch.from_numpy(ref_in)[None], enc_cfg.num_layers,
                enc_cfg.num_heads, enc_cfg.d_model,
            ).numpy()[0]
        feats, flens = log_mel_spectrogram(
            jnp.asarray(w)[None], jnp.array([len(w)]), fe_cfg)
        fv = np.asarray(feats)[0, : int(flens[0])]
        wave_feat_maes.append(
            float(np.abs(fv[: ref_feats.shape[0]] - ref_feats).mean()))
        if mvn is not None:
            from reazonspeech_tpu.espnet.asr.model import _apply_mvn

            feats = _apply_mvn(
                {"normalize": jax.tree.map(jnp.asarray, mvn)}, feats, flens)
        if rnnt_cfg is not None:
            with torch.no_grad():
                ref_tokens, _ = rnnt_greedy_reference(
                    sd, torch.from_numpy(ref_enc), rnnt_cfg.vocab_size,
                    rnnt_cfg.pred_rnn_layers, rnnt_cfg.joint_activation,
                    prefix="decoder", joint_prefix="joint_network",
                    blank_first=True, max_symbols=MAX_SYMBOLS,
                )
            enc_w, elens_w = fastconformer_encode(
                jparams["encoder"], feats, flens, enc_cfg)
            toks, _, counts = rnnt_greedy_decode(
                jparams["predictor"], jparams["joint"], enc_w, elens_w,
                rnnt_cfg, GreedyDecodeConfig(max_symbols_per_step=MAX_SYMBOLS),
            )
            our_tokens = np.asarray(toks)[0, : int(np.asarray(counts)[0])].tolist()
            wave_rates.append(_match_rate(ref_tokens, our_tokens))

    entry = {
        "encoder_logit_mae": max(maes),
        "encoder_logit_rel": max(rels),
        "ctc_log_softmax_mae": max(ctc_maes),
        "token_match_vs_torch": min(token_rates) if token_rates else None,
        "beam20_token_match": min(beam_rates) if beam_rates else None,
        "beam20_fused_impls_token_match": (
            min(beam_fused_rates) if beam_fused_rates else None),
        "wave_feature_mae": max(wave_feat_maes),
        "wave_token_match": min(wave_rates) if wave_rates else None,
        "bf16_residual_token_flip_rate": max(flips) if flips else None,
        "bf16_residual_enc_rel_dev": max(devs) if devs else None,
        "ctc_align_max_frame_drift": (
            max(align_drifts) if align_drifts else None),
        "pass": bool(
            max(maes) < ENC_MAE_TOL
            and max(rels) < ENC_REL_TOL
            and (not token_rates or min(token_rates) >= TOKEN_MATCH_MIN)
            and (not beam_rates or min(beam_rates) >= TOKEN_MATCH_MIN)
            and max(wave_feat_maes) < WAVE_FEAT_MAE_TOL
            and (not wave_rates or min(wave_rates) >= TOKEN_MATCH_MIN)
            and (not align_drifts or max(align_drifts) <= 1)
        ),
        "bf16_serving_ok": bool(not flips or max(flips) <= BF16_FLIP_MAX),
    }
    report["espnet"] = entry
    return entry["pass"]


def gate_k2(repo_dir, size, report):
    """k2 gate: zipformer encoder logit parity vs the torch oracle
    (tools/torch_reference.py:zipformer_encoder_forward — an independent
    cross-framework check of the icefall layout transforms), plus
    decoder/joiner token-for-token parity and the bf16-residual check."""
    import glob

    import jax
    import jax.numpy as jnp
    import torch

    from reazonspeech_tpu.convert.onnx_zipformer import convert_sherpa_snapshot
    from reazonspeech_tpu.decoding.rnnt_greedy import GreedyDecodeConfig, rnnt_greedy_decode
    from reazonspeech_tpu.models.rnnt import RNNTConfig
    from reazonspeech_tpu.models.zipformer import ZipformerConfig, zipformer_encode
    from torch_reference import stateless_greedy_reference, zipformer_encoder_forward

    def find(pat):
        hits = sorted(glob.glob(os.path.join(repo_dir, "**", pat), recursive=True))
        return hits[0] if hits else None

    enc_onnx = find("encoder-*-avg-1.onnx")
    dec_onnx = find("decoder-*-avg-1.onnx")
    joi_onnx = find("joiner-*-avg-1.onnx")
    pt = find("*.pt")
    tokens_txt = find("tokens.txt")
    # fixtures (tiny/small) are built on the tiny zipformer; published repos
    # (size=full semantics) use the default Zipformer-L
    enc_cfg = ZipformerConfig.tiny() if size in ("tiny", "small") else None
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "converted")
        params, enc_cfg, rnnt_cfg = convert_sherpa_snapshot(
            enc_onnx, dec_onnx, joi_onnx, out,
            tokens_txt=tokens_txt, icefall_pt=pt, enc_cfg=enc_cfg,
        )
    from dataclasses import replace

    enc_cfg = replace(enc_cfg, compute_dtype="float32", residual_dtype="float32")
    rnnt_cfg = replace(rnnt_cfg, compute_dtype="float32")
    jparams = jax.tree.map(jnp.asarray, params)
    sd = torch.load(pt, map_location="cpu", weights_only=True)
    if "model" in sd:
        sd = sd["model"]
    sd = {k: v.float() for k, v in sd.items()}

    t = 256 if size != "tiny" else 64
    clips = _mel_clips(3, t, enc_cfg.feat_in, seed=2)
    maes, rels, token_rates, flips, devs = [], [], [], [], []
    for mel in clips:
        enc, elens = zipformer_encode(
            jparams["encoder"], jnp.asarray(mel)[None], jnp.array([mel.shape[0]]),
            enc_cfg,
        )
        enc_np = np.asarray(enc)[0, : int(np.asarray(elens)[0])]
        assert np.isfinite(enc_np).all(), "zipformer produced non-finite output"

        with torch.no_grad():
            ref_enc = zipformer_encoder_forward(
                sd, torch.from_numpy(mel), enc_cfg
            ).numpy()[: enc_np.shape[0]]
        maes.append(float(np.abs(enc_np[: ref_enc.shape[0]] - ref_enc).mean()))
        rels.append(float(
            np.abs(enc_np[: ref_enc.shape[0]] - ref_enc).max()
            / (np.abs(ref_enc).max() + 1e-9)))

        ref_tokens, _ = stateless_greedy_reference(
            sd, torch.from_numpy(enc_np.copy()), rnnt_cfg.context_size,
            max_symbols=MAX_SYMBOLS,
        )
        toks, _, counts = rnnt_greedy_decode(
            jparams["predictor"], jparams["joint"], enc, elens, rnnt_cfg,
            GreedyDecodeConfig(max_symbols_per_step=MAX_SYMBOLS),
        )
        our_tokens = np.asarray(toks)[0, : int(np.asarray(counts)[0])].tolist()
        token_rates.append(_match_rate(ref_tokens, our_tokens))

        # bf16-residual sensitivity (same policy question as the conformers;
        # no oracle needed — both sides are our pipeline)
        base_cfg = replace(enc_cfg, compute_dtype="bfloat16")
        bf_cfg = replace(base_cfg, residual_dtype="bfloat16")
        enc_base, lens_b = zipformer_encode(
            jparams["encoder"], jnp.asarray(mel)[None], jnp.array([mel.shape[0]]),
            base_cfg,
        )
        enc_bf, _ = zipformer_encode(
            jparams["encoder"], jnp.asarray(mel)[None], jnp.array([mel.shape[0]]),
            bf_cfg,
        )
        devs.append(float(
            np.abs(np.asarray(enc_bf) - np.asarray(enc_base)).max()
            / (np.abs(np.asarray(enc_base)).max() + 1e-9)))
        base_toks = _decode(jparams, enc_base, lens_b, rnnt_cfg)
        bf_toks = _decode(jparams, enc_bf, lens_b, rnnt_cfg)
        flips.append(1.0 - _match_rate(base_toks, bf_toks))

    # WAVEFORM-IN stage: kaldi-native-fbank semantics (povey window,
    # snip_edges=False — what sherpa pins for the published k2 weights) via
    # the torch oracle, end-to-end through the zipformer + stateless greedy.
    from reazonspeech_tpu.frontend.features import (
        kaldi_frontend_config,
        log_mel_spectrogram,
    )
    from torch_reference import kaldi_fbank_reference

    fe_cfg = kaldi_frontend_config(n_mels=enc_cfg.feat_in)
    wave_feat_maes, wave_rates = [], []
    for w in _wave_clips(2, 2.1 if size == "tiny" else 4.2, seed=5):
        with torch.no_grad():
            ref_feats = kaldi_fbank_reference(
                w, n_mels=enc_cfg.feat_in).numpy()
            ref_enc = zipformer_encoder_forward(
                sd, torch.from_numpy(ref_feats), enc_cfg).numpy()
            ref_tokens, _ = stateless_greedy_reference(
                sd, torch.from_numpy(ref_enc), rnnt_cfg.context_size,
                max_symbols=MAX_SYMBOLS,
            )
        feats, flens = log_mel_spectrogram(
            jnp.asarray(w)[None], jnp.array([len(w)]), fe_cfg)
        fv = np.asarray(feats)[0, : int(flens[0])]
        wave_feat_maes.append(
            float(np.abs(fv[: ref_feats.shape[0]] - ref_feats).mean()))
        enc_w, elens_w = zipformer_encode(
            jparams["encoder"], feats, flens, enc_cfg)
        toks, _, counts = rnnt_greedy_decode(
            jparams["predictor"], jparams["joint"], enc_w, elens_w, rnnt_cfg,
            GreedyDecodeConfig(max_symbols_per_step=MAX_SYMBOLS),
        )
        our_tokens = np.asarray(toks)[0, : int(np.asarray(counts)[0])].tolist()
        wave_rates.append(_match_rate(ref_tokens, our_tokens))

    entry = {
        "encoder_logit_mae": max(maes),
        "encoder_logit_rel": max(rels),
        "decoder_joiner_token_match": min(token_rates),
        "wave_feature_mae": max(wave_feat_maes),
        "wave_token_match": min(wave_rates),
        "bf16_residual_token_flip_rate": max(flips),
        "bf16_residual_enc_rel_dev": max(devs),
        "pass": bool(
            max(maes) < ENC_MAE_TOL
            and max(rels) < ENC_REL_TOL
            and min(token_rates) >= TOKEN_MATCH_MIN
            and max(wave_feat_maes) < WAVE_FEAT_MAE_TOL
            and min(wave_rates) >= TOKEN_MATCH_MIN
        ),
        "bf16_serving_ok": bool(max(flips) <= BF16_FLIP_MAX),
    }
    report["k2"] = entry
    return entry["pass"]


def gate_avsr(model_dir, size, report):
    """AVSR gate: encoder logit parity vs the torch AVHuBERT oracle
    (audio-only path; the video trunk is covered by conv3d primitive
    parity) and greedy seq2seq token parity through OUR cached-KV generate
    vs the oracle's teacher-forced greedy — the HF-GenerationMixin-shaped
    check VERDICT round 1 (weak 7) asked for."""
    import numpy as np
    import torch

    from reazonspeech_tpu.avsr.configuration_avhubert import AVHubertConfig
    from reazonspeech_tpu.avsr.model import AVHubertForConditionalGeneration
    from torch_reference import (
        avhubert_encoder_forward,
        avhubert_greedy_reference,
    )

    model = AVHubertForConditionalGeneration.from_pretrained(model_dir)
    cfg = model.config
    sd = torch.load(os.path.join(model_dir, "pytorch_model.bin"),
                    map_location="cpu", weights_only=True)
    sd = {k: v.float() for k, v in sd.items()}

    t = 24 if size == "tiny" else 48
    rng = np.random.default_rng(9)
    maes, rels, token_rates, beam_rates = [], [], [], []
    for _ in range(3):
        audio = rng.standard_normal((t, cfg.audio_feat_dim)).astype(np.float32)
        with torch.no_grad():
            ref_enc = avhubert_encoder_forward(sd, cfg, torch.from_numpy(audio))
        ours, _ = model.encoder(audio=audio[None])
        ours = np.asarray(ours)[0]
        maes.append(float(np.abs(ours - ref_enc.numpy()).mean()))
        rels.append(float(np.abs(ours - ref_enc.numpy()).max()
                          / (np.abs(ref_enc.numpy()).max() + 1e-9)))

        # oracle returns [bos, t1, ...]; our generate returns generated
        # tokens only — compare the generated suffix (8 steps each)
        ref_tokens = avhubert_greedy_reference(sd, cfg, ref_enc, max_length=9)[1:]
        out = np.asarray(model.generate(audio=audio[None], num_beams=1,
                                        max_length=8))[0]
        ours_tokens = []
        for tok in out.tolist():
            ours_tokens.append(int(tok))
            if tok == cfg.eos_token_id:
                break
        token_rates.append(_match_rate(ref_tokens, ours_tokens))

        # beam-5 (the reference's generate default, HF BeamSearchScorer
        # semantics) vs the serial oracle — VERDICT r2 item 3
        from torch_reference import avhubert_beam_reference

        ref_beam = avhubert_beam_reference(
            sd, cfg, ref_enc, num_beams=5, max_length=9)[1:]
        bout = np.asarray(model.generate(audio=audio[None], num_beams=5,
                                         max_length=8))[0]
        ours_beam = []
        for tok in bout.tolist():
            ours_beam.append(int(tok))
            if tok == cfg.eos_token_id:
                break
        beam_rates.append(_match_rate(ref_beam, ours_beam))

    entry = {
        "encoder_logit_mae": max(maes),
        "encoder_logit_rel": max(rels),
        "greedy_token_match": min(token_rates),
        "beam5_token_match": min(beam_rates),
        "pass": bool(
            max(maes) < ENC_MAE_TOL
            and max(rels) < ENC_REL_TOL
            and min(token_rates) >= TOKEN_MATCH_MIN
            and min(beam_rates) >= TOKEN_MATCH_MIN
        ),
    }
    report["avsr"] = entry
    return entry["pass"]


def build_fixtures(td, size):
    """Fabricate faithful containers (tests/fixture_checkpoints.py)."""
    from fixture_checkpoints import (
        write_espnet_zoo,
        write_k2_repo,
        write_nemo_archive,
    )
    from reazonspeech_tpu.models.conformer import espnet_encoder_config
    from reazonspeech_tpu.models.fastconformer import FastConformerConfig
    from reazonspeech_tpu.models.rnnt import RNNTConfig
    from reazonspeech_tpu.models.zipformer import ZipformerConfig

    if size == "tiny":
        n_enc = FastConformerConfig.tiny()
        n_rnnt = RNNTConfig.tiny(enc_dim=n_enc.d_model)
        e_enc = espnet_encoder_config(
            num_layers=2, d_model=32, num_heads=4, subsampling_channels=32
        )
        z_enc = ZipformerConfig.tiny()
    else:  # "small": deep enough for error accumulation to show
        n_enc = FastConformerConfig.tiny(num_layers=8, d_model=256, num_heads=8,
                                         subsampling_channels=64)
        n_rnnt = RNNTConfig(vocab_size=256, enc_dim=256, pred_hidden=64,
                            joint_hidden=64)
        e_enc = espnet_encoder_config(
            num_layers=8, d_model=128, num_heads=8, subsampling_channels=128
        )
        z_enc = ZipformerConfig.tiny()

    nemo = os.path.join(td, "model.nemo")
    write_nemo_archive(nemo, n_enc, n_rnnt)

    e_tokens = ["<blank>"] + [chr(c) for c in range(0x3041, 0x3041 + 40)] + ["<sos/eos>"]
    e_rnnt = RNNTConfig(vocab_size=len(e_tokens), enc_dim=e_enc.d_model,
                        pred_hidden=24, joint_hidden=32,
                        joint_activation="tanh", blank_position="first")
    ezoo = os.path.join(td, "espnet")
    write_espnet_zoo(ezoo, e_enc, e_tokens, e_rnnt)

    k_tokens = ["<blk>", "<sos/eos>", "<unk>"] + [chr(c) for c in range(0x3041, 0x3041 + 40)]
    k_rnnt = RNNTConfig(vocab_size=len(k_tokens), enc_dim=z_enc.out_dim,
                        pred_hidden=24, joint_hidden=32, joint_activation="tanh",
                        predictor_kind="stateless", context_size=2)
    k2 = os.path.join(td, "k2")
    write_k2_repo(k2, z_enc, k_rnnt, k_tokens)

    from fixture_checkpoints import write_avhubert_hf_dir

    from reazonspeech_tpu.avsr.configuration_avhubert import AVHubertConfig

    avsr = os.path.join(td, "avsr")
    write_avhubert_hf_dir(avsr, AVHubertConfig.tiny(audio_feat_dim=104))
    return nemo, ezoo, k2, avsr


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixtures", action="store_true",
                    help="fabricate faithful containers with random weights")
    ap.add_argument("--size", default="tiny", choices=("tiny", "small"))
    ap.add_argument("--nemo", help=".nemo archive path")
    ap.add_argument("--espnet", help="espnet-zoo directory")
    ap.add_argument("--k2", help="sherpa k2 repo directory")
    ap.add_argument("--avsr", help="AVHuBERT HF checkpoint directory")
    ap.add_argument("--out", default="PARITY_GATE.json")
    args = ap.parse_args(argv)

    report = {"size": args.size, "weights": "fixtures" if args.fixtures else "published"}
    ok = True
    with tempfile.TemporaryDirectory() as td:
        nemo, ezoo, k2, avsr = args.nemo, args.espnet, args.k2, args.avsr
        if args.fixtures:
            nemo, ezoo, k2, avsr = build_fixtures(td, args.size)
        if nemo:
            ok &= gate_nemo(nemo, args.size, report)
            print("nemo:", json.dumps(report["nemo"]), file=sys.stderr)
        if ezoo:
            ok &= gate_espnet(ezoo, args.size, report)
            print("espnet:", json.dumps(report["espnet"]), file=sys.stderr)
        if k2:
            ok &= gate_k2(k2, args.size, report)
            print("k2:", json.dumps(report["k2"]), file=sys.stderr)
        if avsr:
            ok &= gate_avsr(avsr, args.size, report)
            print("avsr:", json.dumps(report["avsr"]), file=sys.stderr)

    report["pass"] = bool(ok)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
