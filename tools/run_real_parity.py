"""One-command real-weights runbook: artifacts -> gates -> CER -> decisions.

VERDICT r2 item 4: when the published checkpoints become available (no egress
in the dev environment), ONE invocation takes "weights on disk" to a full
decision record:

  1. validates the artifact set per family (clear remediation when wrong),
  2. runs the converter -> torch-oracle parity gates (tools/convert_and_gate:
     encoder logits, greedy + serving-beam token parity, waveform-in
     frontend parity),
  3. audits the checkpoint's own decoding config against our serving default,
  4. measures CER on a local eval dataset (metadata.jsonl + WAVs — JSUT or a
     reazonspeech-tiny download in the examples/evaluation/local_fixture.py
     layout) for the serving default AND the open policy variants:
       - greedy vs the reference-default beam,
       - fp32 vs bf16 residual stream (the round-2 gate measured 78% token
         flips on RANDOM weights; real margins decide),
       - greedy frame_window 1 vs 4 (blank-run skipping),
  5. emits REAL_PARITY.json with per-variant CER/flip rates and a
     "decisions" block (bf16_residual / frame_window / decode_default).

CI keeps the whole flow green without real weights:

  python tools/run_real_parity.py --fixture-dryrun

With real artifacts (all optional; families without artifacts are skipped):

  python tools/run_real_parity.py \
      --nemo path/to/reazonspeech-nemo-v2.nemo \
      --espnet path/to/espnet_zoo_dir \
      --k2 path/to/sherpa_repo_dir \
      --avsr path/to/avhubert_hf_dir \
      --eval-data path/to/dataset_dir \
      --out REAL_PARITY.json

Expected artifact sets (what to download from the published repos):
  nemo    reazon-research/reazonspeech-nemo-v2: the .nemo archive
          (model_config.yaml + model_weights.ckpt + tokenizer .model inside)
  espnet  reazon-research/reazonspeech-espnet-v2: exp/<run>/config.yaml +
          exp/<run>/*.pth (the averaged valid checkpoint)
  k2      reazon-research/reazonspeech-k2-v2: tokens.txt,
          encoder/decoder/joiner-epoch-99-avg-1.onnx (and/or exp/*.pt)
  avsr    reazon-research/japanese-avhubert (HF layout): config.json +
          pytorch_model.bin / model.safetensors
  eval    a directory with metadata.jsonl rows
          {"audio": {"path": ...}, "transcription": ...} + the WAVs
          (examples/evaluation/local_fixture.py builds a synthetic one; for
          JSUT convert basic5000 with the same layout)
"""

import argparse
import json
import os
import sys
import tarfile
import tempfile

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples",
                                "evaluation"))

CER_TOL_BF16 = 0.002  # absolute CER delta below which bf16 residual is a win
CER_TOL_FRAME_WINDOW = 0.0  # frame_window must be CER-neutral


# ---------------------------------------------------------------------------
# artifact validation
# ---------------------------------------------------------------------------


def _glob1(root, pat):
    import glob

    hits = sorted(glob.glob(os.path.join(root, "**", pat), recursive=True))
    return hits[0] if hits else None


def validate_artifacts(family, path):
    """Returns (ok, problems:list[str])."""
    problems = []
    if family == "nemo":
        if not (os.path.isfile(path) and tarfile.is_tarfile(path)):
            problems.append(f"{path}: not a .nemo tar archive")
        else:
            with tarfile.open(path) as tar:
                names = [os.path.basename(n) for n in tar.getnames()]
            for need in ("model_config.yaml", "model_weights.ckpt"):
                if need not in names:
                    problems.append(
                        f"{path}: archive lacks {need} — download the full "
                        ".nemo from reazon-research/reazonspeech-nemo-v2")
    elif family == "espnet":
        if not _glob1(path, "*.pth"):
            problems.append(f"{path}: no *.pth checkpoint (espnet zoo "
                            "exp/<run>/valid.acc.ave*.pth)")
        if not _glob1(path, "config.yaml"):
            problems.append(f"{path}: no config.yaml next to the .pth")
    elif family == "k2":
        if not _glob1(path, "tokens.txt"):
            problems.append(f"{path}: no tokens.txt")
        if not (_glob1(path, "encoder-*.onnx") or _glob1(path, "*.pt")):
            problems.append(f"{path}: need encoder/decoder/joiner ONNX "
                            "graphs or an icefall exp/*.pt")
    elif family == "avsr":
        if not os.path.isfile(os.path.join(path, "config.json")):
            problems.append(f"{path}: no config.json (HF checkpoint dir)")
        if not (_glob1(path, "pytorch_model.bin")
                or _glob1(path, "*.safetensors")):
            problems.append(f"{path}: no weights file")
    return (not problems), problems


# ---------------------------------------------------------------------------
# decoding-config audit (nemo)
# ---------------------------------------------------------------------------


def audit_nemo_decoding(nemo_path):
    from reazonspeech_tpu.convert.nemo_fastconformer import read_nemo_tar

    _, config, _ = read_nemo_tar(nemo_path)
    decoding = (config or {}).get("decoding") or {}
    beam = decoding.get("beam") or {}
    audit = {
        "checkpoint_strategy": decoding.get("strategy"),
        "checkpoint_beam_size": beam.get("beam_size"),
        "serving_default": "alsd beam 4",
        "matches_serving_default": decoding.get("strategy") in
        (None, "alsd", "beam") and beam.get("beam_size", 4) == 4,
    }
    return audit


# ---------------------------------------------------------------------------
# CER measurement
# ---------------------------------------------------------------------------


def _load_rows(eval_dir, limit):
    rows = []
    with open(os.path.join(eval_dir, "metadata.jsonl")) as f:
        for line in f:
            if not line.strip():
                continue
            r = json.loads(line)
            audio = r["audio"]["path"] if isinstance(r.get("audio"), dict) \
                else r.get("audio") or r.get("path")
            if not os.path.isabs(audio):
                audio = os.path.join(eval_dir, audio)
            rows.append((audio, r.get("transcription") or r.get("text", "")))
            if limit and len(rows) >= limit:
                break
    return rows


def _cer(pairs):
    from reazonspeech_tpu.evaluation.utils import calculate_cer

    dist = length = 0
    for truth, pred in pairs:
        r = calculate_cer(truth, pred)
        dist += r["distance"]
        length += r["length"]
    return dist / max(length, 1)


def _run_variant(load, transcribe_fn, rows):
    """Returns (cer, texts) for one model variant over the eval rows."""
    from reazonspeech_tpu.core.audio import audio_from_path

    model = load()
    texts = []
    for wav, _ in rows:
        texts.append(transcribe_fn(model, audio_from_path(wav)).text)
    cer = _cer([(t, p) for (_, t), p in zip(rows, texts)])
    return cer, texts


def _flip_rate(a_texts, b_texts):
    flips = sum(1 for a, b in zip(a_texts, b_texts) if a != b)
    return flips / max(len(a_texts), 1)


def eval_nemo(conv_path, rows, report):
    """CER for the nemo policy variants + the decision block inputs."""
    from reazonspeech_tpu.decoding.rnnt_greedy import GreedyDecodeConfig
    from reazonspeech_tpu.nemo.asr import transcribe
    from reazonspeech_tpu.nemo.asr.model import load_model

    entry = {}

    def run(tag, **kw):
        env_res = kw.pop("residual", None)
        old = os.environ.get("REAZONSPEECH_TPU_RESIDUAL_DTYPE")
        if env_res:
            os.environ["REAZONSPEECH_TPU_RESIDUAL_DTYPE"] = env_res
        try:
            cer, texts = _run_variant(
                lambda: load_model(checkpoint=conv_path, **kw),
                transcribe, rows)
        finally:
            if env_res:
                if old is None:
                    os.environ.pop("REAZONSPEECH_TPU_RESIDUAL_DTYPE", None)
                else:
                    os.environ["REAZONSPEECH_TPU_RESIDUAL_DTYPE"] = old
        entry[tag] = {"cer": cer}
        return texts

    beam_texts = run("beam_default")
    greedy_texts = run("greedy", decoding="greedy")
    bf16_texts = run("beam_bf16_residual", residual="bfloat16")
    fw_texts = run(
        "greedy_frame_window4", decoding="greedy",
        decode_cfg=GreedyDecodeConfig(frame_window=4))

    entry["bf16_residual_text_flip_rate"] = _flip_rate(beam_texts, bf16_texts)
    entry["frame_window_text_flip_rate"] = _flip_rate(greedy_texts, fw_texts)
    d_bf16 = entry["beam_bf16_residual"]["cer"] - entry["beam_default"]["cer"]
    d_fw = (entry["greedy_frame_window4"]["cer"] - entry["greedy"]["cer"])
    entry["decisions"] = {
        "bf16_residual": "enable" if d_bf16 <= CER_TOL_BF16 else "keep-fp32",
        "bf16_cer_delta": d_bf16,
        "frame_window": 4 if d_fw <= CER_TOL_FRAME_WINDOW else 1,
        "frame_window_cer_delta": d_fw,
        "decode_default": "alsd-beam (reference parity)",
    }
    report["nemo_eval"] = entry


def eval_espnet(conv_path, rows, report):
    from reazonspeech_tpu.espnet.asr import transcribe
    from reazonspeech_tpu.espnet.asr.transcribe import load_model

    entry = {}
    cer_b, beam_texts = _run_variant(
        lambda: load_model(checkpoint=conv_path), transcribe, rows)
    cer_g, greedy_texts = _run_variant(
        lambda: load_model(checkpoint=conv_path, decoding="greedy"),
        transcribe, rows)
    # the alignment-synchronous opt-in (2.2x faster at serving shapes,
    # BENCHMARKS.md): this CER A/B is the documented gate for flipping the
    # serving default from "beam" to "maes"
    cer_m, maes_texts = _run_variant(
        lambda: load_model(checkpoint=conv_path, decoding="maes"),
        transcribe, rows)
    entry["beam20_default"] = {"cer": cer_b}
    entry["greedy"] = {"cer": cer_g}
    entry["maes"] = {"cer": cer_m}
    entry["beam_vs_greedy_text_flip_rate"] = _flip_rate(beam_texts, greedy_texts)
    entry["beam_vs_maes_text_flip_rate"] = _flip_rate(beam_texts, maes_texts)
    entry["emission_stats"] = emission_stats(conv_path, rows)
    entry["decisions"] = {
        "decode_default": "espnet default_beam_search 20 (reference parity)",
        "beam_cer_delta_vs_greedy": cer_b - cer_g,
        "maes_cer_delta_vs_beam": cer_m - cer_b,
        "flip_default_to_maes_if": "abs(maes_cer_delta_vs_beam) <= 0.001",
        "max_pops_per_frame":
            entry["emission_stats"]["recommended_max_pops_per_frame"],
    }
    report["espnet_eval"] = entry


def emission_stats(conv_path, rows):
    """Pop-budget + blank-run statistics on real weights (VERDICT r3 item 5:
    size GravesBeamConfig.max_pops_per_frame and frame_window from measured
    emission density instead of the modeled worst case)."""
    import jax.numpy as jnp
    import numpy as np

    from reazonspeech_tpu.core.audio import audio_from_path, norm_audio, pad_audio
    from reazonspeech_tpu.decoding.transducer_graves import (
        GravesBeamConfig,
        graves_beam_decode_stats,
    )
    from reazonspeech_tpu.espnet.asr.model import (
        _apply_mvn,
        load_model_container,
    )
    from reazonspeech_tpu.frontend.features import log_mel_spectrogram
    from reazonspeech_tpu.models.fastconformer import fastconformer_encode

    model = load_model_container(checkpoint=conv_path)
    cfg = model.decode_cfg
    assert isinstance(cfg, GravesBeamConfig)

    pmaxes, mean_pops, sat, gaps, density = [], [], 0, [], []
    for wav_path, _ in rows:
        audio = pad_audio(norm_audio(audio_from_path(wav_path)), 0.5)
        buf, lens = model._bucket(audio.waveform)
        feats, flens = log_mel_spectrogram(
            jnp.asarray(buf), jnp.asarray(lens), model.fe_cfg)
        feats = _apply_mvn(model.params, feats, flens)
        enc, elens = fastconformer_encode(
            model.params["encoder"], feats, flens, model.enc_cfg)
        tokens, frames, counts, _, saturated, pmax, ptot = (
            graves_beam_decode_stats(
                model.params["predictor"], model.params["joint"],
                enc, elens, model.rnnt_cfg, cfg))
        t = max(int(elens[0]), 1)
        c = int(counts[0])
        pmaxes.append(int(pmax[0]))
        mean_pops.append(float(ptot[0]) / t)
        sat += int(bool(saturated[0]))
        density.append(c / t)
        f = np.asarray(frames[0, :c])
        if c > 1:
            gaps.extend(np.diff(f).tolist())

    p_default = cfg.max_pops_per_frame or (6 * min(cfg.beam_size, 1 << 30) + 8)
    observed = max(pmaxes) if pmaxes else 0
    rec = int(-(-max(1, round(observed * 1.25)) // 8) * 8)
    stats = {
        "rows": len(rows),
        "pops_per_frame_max_observed": observed,
        "pops_per_frame_mean": round(float(np.mean(mean_pops)), 2)
        if mean_pops else None,
        "pop_budget_default": p_default,
        "saturation_rows": sat,
        "emissions_per_frame_mean": round(float(np.mean(density)), 3)
        if density else None,
        "inter_emission_gap_median": float(np.median(gaps)) if gaps else None,
        "inter_emission_gap_p10": float(np.percentile(gaps, 10))
        if gaps else None,
        # headroom rule: 1.25x the worst observed frame, rounded up to 8;
        # never below the default when saturation was seen at the default
        "recommended_max_pops_per_frame": max(rec, p_default) if sat else rec,
        # frame_window can skip blank runs only if real emissions are
        # sparse; the CER-delta decision in nemo_eval stays authoritative
        "frame_window_supported_by_gaps":
            bool(gaps) and float(np.percentile(gaps, 10)) >= 4.0,
    }
    return stats


def eval_v1(conv_path, rows, report):
    """v1 streaming path on converted weights: caption generator runs
    end-to-end, timings are monotonic in-bounds, and the concatenated text
    is CER-scored (VERDICT r3 item 5)."""
    import numpy as np

    from reazonspeech_tpu.core.audio import audio_from_path, norm_audio
    from reazonspeech_tpu.espnet.asr.model import load_model_container
    from reazonspeech_tpu.v1.transcribe import transcribe as v1_transcribe

    model = load_model_container(checkpoint=conv_path)
    entry = {"rows": []}
    texts = []
    for wav_path, _ in rows:
        audio = norm_audio(audio_from_path(wav_path))
        dur = len(audio.waveform) / 16000.0
        try:
            caps = list(v1_transcribe(audio.waveform, speech2text=model))
            mono = all(
                0.0 <= c.start_seconds <= c.end_seconds <= dur + 1e-6
                for c in caps)
            texts.append("".join(c.text for c in caps))
            entry["rows"].append(
                {"captions": len(caps), "timings_in_bounds": mono})
        except Exception as e:
            texts.append("")
            entry["rows"].append({"error": f"{type(e).__name__}: {e}"})
    entry["cer"] = _cer([(t, p) for (_, t), p in zip(rows, texts)])
    entry["all_timings_in_bounds"] = all(
        r.get("timings_in_bounds", False) or "error" in r
        for r in entry["rows"])
    report["v1_eval"] = entry


def eval_oneseg(conv_path, rows, report):
    """oneseg forced aligner on converted weights: ground-truth text aligned
    against its audio; segment bounds + re-ASR QC recorded (the corpus
    builder's QC loop, pkg/espnet-oneseg/src/align.py)."""
    import numpy as np

    from reazonspeech_tpu.core.audio import audio_from_path, norm_audio
    from reazonspeech_tpu.espnet.asr.model import load_model_container
    from reazonspeech_tpu.oneseg.align import CTCSegmentationAligner, _recognize
    from reazonspeech_tpu.core.text import cer as _cer_pair

    model = load_model_container(checkpoint=conv_path)
    aligner = CTCSegmentationAligner(model)
    vocab = set(model.tokenizer.pieces)
    entry = {"rows": []}
    for wav_path, text in rows:
        audio = norm_audio(audio_from_path(wav_path))
        dur = len(audio.waveform) / 16000.0
        in_vocab = "".join(c for c in text if c in vocab)
        stripped = in_vocab != text
        if not in_vocab:
            entry["rows"].append(
                {"error": "no in-vocabulary characters to align"})
            continue
        text = in_vocab
        try:
            seg = aligner(audio.waveform, text).segments[0]
            start, end, score = seg
            asr = _recognize(model, audio.waveform)
            entry["rows"].append({
                "in_bounds": bool(0.0 <= start <= end <= dur + 1e-6),
                "score": float(score),
                "qc_cer": _cer_pair(text, asr),
                "oov_stripped": stripped,
            })
        except ValueError as e:
            entry["rows"].append({"error": f"{type(e).__name__}: {e}"})
    aligned = [r for r in entry["rows"] if "error" not in r]
    entry["aligned_rows"] = len(aligned)
    entry["all_in_bounds"] = all(r["in_bounds"] for r in aligned)
    entry["mean_qc_cer"] = (
        float(np.mean([r["qc_cer"] for r in aligned])) if aligned else None)
    report["oneseg_eval"] = entry


def eval_k2(repo_path, conv_base, rows, report):
    from reazonspeech_tpu.convert.onnx_zipformer import convert_sherpa_snapshot
    from reazonspeech_tpu.k2.asr import transcribe
    from reazonspeech_tpu.k2.asr.huggingface import load_model
    from reazonspeech_tpu.models.zipformer import ZipformerConfig

    # published repos carry the Zipformer-L dims in the graphs; fixtures are
    # tiny — infer by probing for the fixture marker the gate uses
    enc_cfg = None
    if os.environ.get("REAZONSPEECH_TPU_DRYRUN_TINY"):
        enc_cfg = ZipformerConfig.tiny()
    convert_sherpa_snapshot(
        _glob1(repo_path, "encoder-*avg-1.onnx"),
        _glob1(repo_path, "decoder-*avg-1.onnx"),
        _glob1(repo_path, "joiner-*avg-1.onnx"),
        conv_base,
        tokens_txt=_glob1(repo_path, "tokens.txt"),
        icefall_pt=_glob1(repo_path, "*.pt"),
        enc_cfg=enc_cfg,
    )
    cer, _ = _run_variant(
        lambda: load_model(checkpoint=conv_base), transcribe, rows)
    report["k2_eval"] = {"greedy_default": {"cer": cer}}


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nemo")
    ap.add_argument("--espnet")
    ap.add_argument("--k2")
    ap.add_argument("--avsr")
    ap.add_argument("--eval-data")
    ap.add_argument("--limit", type=int, default=0,
                    help="cap eval rows (0 = all)")
    ap.add_argument("--size", default="full",
                    help="gate model-size hint (full for published weights)")
    ap.add_argument("--fixture-dryrun", action="store_true",
                    help="fabricate artifacts + synthetic eval data and run "
                         "the complete flow offline (CI)")
    ap.add_argument("--out", default="REAL_PARITY.json")
    args = ap.parse_args(argv)

    import convert_and_gate as cg

    report = {"mode": "fixture-dryrun" if args.fixture_dryrun else "real"}
    ok = True
    with tempfile.TemporaryDirectory() as td:
        if args.fixture_dryrun:
            args.nemo, args.espnet, args.k2, args.avsr = cg.build_fixtures(
                td, "tiny")
            args.size = "tiny"
            os.environ["REAZONSPEECH_TPU_DRYRUN_TINY"] = "1"
            from local_fixture import build_fixture

            args.eval_data = os.path.join(td, "eval")
            build_fixture(args.eval_data, rows=3, seconds=0.5)
            args.limit = args.limit or 2

        # 1) artifacts
        report["artifacts"] = {}
        for fam in ("nemo", "espnet", "k2", "avsr"):
            path = getattr(args, fam)
            if not path:
                continue
            valid, problems = validate_artifacts(fam, path)
            report["artifacts"][fam] = {"path": path, "ok": valid,
                                        "problems": problems}
            if not valid:
                ok = False
                print(f"[artifacts] {fam}: " + "; ".join(problems),
                      file=sys.stderr)
        if not ok:
            report["pass"] = False
            with open(args.out, "w") as f:
                json.dump(report, f, indent=2)
            return 1

        # 2) gates (converter -> torch oracle, incl. beams + waveform-in)
        gate_size = args.size if args.size in ("tiny", "small") else "small"
        if args.nemo:
            ok &= cg.gate_nemo(args.nemo, gate_size, report)
        if args.espnet:
            ok &= cg.gate_espnet(args.espnet, gate_size, report)
        if args.k2:
            ok &= cg.gate_k2(args.k2, gate_size, report)
        if args.avsr:
            ok &= cg.gate_avsr(args.avsr, gate_size, report)

        # 3) decoding-config audit
        if args.nemo:
            report["nemo_decoding_audit"] = audit_nemo_decoding(args.nemo)

        # 4) CER + policy variants (converted trees, serving config)
        if args.eval_data:
            rows = _load_rows(args.eval_data, args.limit)
            conv = os.path.join(td, "conv")
            if args.nemo:
                from reazonspeech_tpu.convert.nemo_fastconformer import (
                    convert_nemo_checkpoint,
                )

                convert_nemo_checkpoint(args.nemo, conv + "_nemo")
                eval_nemo(conv + "_nemo", rows, report)
            if args.espnet:
                from reazonspeech_tpu.convert.espnet_conformer import (
                    convert_espnet_checkpoint,
                )

                pth = _glob1(args.espnet, "*.pth")
                cfg = _glob1(args.espnet, "config.yaml")
                convert_espnet_checkpoint(pth, conv + "_esp", config_yaml=cfg)
                eval_espnet(conv + "_esp", rows, report)
                # the espnet weights also back the v1 streaming path and the
                # oneseg corpus aligner — gate them on the same conversion
                eval_v1(conv + "_esp", rows, report)
                eval_oneseg(conv + "_esp", rows, report)
            if args.k2:
                eval_k2(args.k2, conv + "_k2", rows, report)

    report["pass"] = bool(ok)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items()
                      if k in ("pass", "mode")}))
    for fam in ("nemo_eval", "espnet_eval", "k2_eval"):
        if fam in report:
            print(fam, json.dumps(report[fam].get("decisions",
                                                  report[fam])))
    if "espnet_eval" in report:
        print("emission_stats",
              json.dumps(report["espnet_eval"].get("emission_stats", {}),
                         ensure_ascii=False))
    for fam in ("v1_eval", "oneseg_eval"):
        if fam in report:
            summary = {k: v for k, v in report[fam].items() if k != "rows"}
            print(fam, json.dumps(summary, ensure_ascii=False))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
