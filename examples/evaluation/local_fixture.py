"""Local 10-row evaluation dataset for offline runs.

The upstream examples evaluate on `reazon-research/reazonspeech` "tiny"
(pkg/evaluation/examples/*/eval.py), which needs hub egress. This builds an
equivalent local dataset — WAV files + transcriptions with the same column
layout (``audio`` as a non-decoded path column, ``transcription``) — so every
eval example runs end-to-end in CI and on air-gapped machines:

    python eval.py --local-fixture /tmp/rs_fixture

The audio is synthetic (band-limited tones; ASR output with random weights
is garbage by design) — the point is exercising the full evaluate() loop:
dataset plumbing, per-rank model load, prediction mapping, CER aggregation.
"""

import json
import os

import numpy as np

TRANSCRIPTS = [
    "こんにちは",
    "今日は晴れです",
    "天気がとても良い",
    "音声認識のテスト",
    "はい、そうです。",
    "明日も晴れるでしょう",
    "これはサンプル音声です",
    "ありがとうございました",
    "もう一度お願いします",
    "以上です。",
]


def build_fixture(dirpath, rows=10, seconds=1.0, samplerate=16000):
    """Create WAVs + metadata.jsonl under ``dirpath``; returns the dir."""
    from reazonspeech_tpu.core.audio import audio_from_numpy, audio_to_file

    os.makedirs(dirpath, exist_ok=True)
    rng = np.random.default_rng(0)
    meta_path = os.path.join(dirpath, "metadata.jsonl")
    with open(meta_path, "w", encoding="utf-8") as f:
        for i in range(rows):
            n = int(seconds * samplerate)
            t = np.arange(n) / samplerate
            freq = 180.0 + 40.0 * (i % 5)
            wav = (
                0.2 * np.sin(2 * np.pi * freq * t)
                + 0.05 * rng.standard_normal(n)
            ).astype(np.float32)
            path = os.path.join(dirpath, f"{i:03d}.wav")
            audio_to_file(path, audio_from_numpy(wav, samplerate))
            f.write(
                json.dumps(
                    {"audio": path, "transcription": TRANSCRIPTS[i % len(TRANSCRIPTS)]},
                    ensure_ascii=False,
                )
                + "\n"
            )
    return dirpath


def load_fixture(dirpath, build_if_missing=True):
    """Load (building if needed) the fixture as a datasets.Dataset whose
    rows mirror the hub dataset: {"audio": {"path": ...}, "transcription"}."""
    meta_path = os.path.join(dirpath, "metadata.jsonl")
    if not os.path.exists(meta_path):
        if not build_if_missing:
            raise FileNotFoundError(meta_path)
        build_fixture(dirpath)

    import datasets

    rows = []
    with open(meta_path, encoding="utf-8") as f:
        for line in f:
            r = json.loads(line)
            rows.append(
                {"audio": {"path": r["audio"]}, "transcription": r["transcription"]}
            )
    return datasets.Dataset.from_list(rows)
