"""Manifest-driven training batches (WAV paths + transcriptions → padded
device-ready dicts).

Input is the same JSONL manifest layout the corpus builder writes
(oneseg/utils.py dataset.json rows / examples/evaluation/local_fixture.py):
one object per line with ``audio`` (wav path) and ``transcription``. Batches
are STATIC-SHAPE (bucketed padding) so one compiled train step serves the
whole epoch — the XLA counterpart of the reference toolkits' dynamic
bucketing samplers.
"""

import json

import numpy as np

__all__ = ["read_manifest", "manifest_batches"]


def read_manifest(path):
    """[{audio, transcription}, ...] from a JSONL manifest."""
    rows = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def _bucket(n, step):
    return max(step, -(-n // step) * step)


def manifest_batches(
    manifest,
    tokenizer,
    batch_size,
    samples_bucket=16000,
    label_bucket=16,
    epochs=1,
    shuffle=True,
    seed=0,
    drop_unknown=True,
):
    """Yield train-step batches from a manifest (path or row list).

    Waveforms are padded to a multiple of ``samples_bucket`` samples and
    labels to a multiple of ``label_bucket`` tokens, batch-wide, so the set
    of compiled programs stays bounded. Rows whose transcription cannot be
    tokenized are skipped (drop_unknown) or raise.
    """
    from ..core.audio import audio_from_path

    rows = read_manifest(manifest) if isinstance(manifest, str) else list(manifest)
    rng = np.random.default_rng(seed)

    if not rows:
        raise ValueError("empty manifest")
    yielded = 0
    for _ in range(epochs):
        order = rng.permutation(len(rows)) if shuffle else np.arange(len(rows))
        for i in range(0, len(order), batch_size):
            idxs = list(order[i : i + batch_size])
            # tail batch: cycle earlier rows to keep the batch static-shape
            # (same policy as the dropped-row refill below) instead of
            # silently discarding len(rows) % batch_size rows per epoch
            k = 0
            while len(idxs) < batch_size:
                idxs.append(order[k % len(order)])
                k += 1
            chunk = [rows[j] for j in idxs]
            wavs, labels = [], []
            for r in chunk:
                try:
                    ids = tokenizer.text_to_ids(r["transcription"])
                except (KeyError, ValueError):
                    if drop_unknown:
                        ids = None
                    else:
                        raise
                if ids is None or not ids:
                    continue
                audio = audio_from_path(r["audio"])
                wavs.append(np.asarray(audio.waveform, np.float32))
                labels.append(np.asarray(ids, np.int32))
            if not wavs:
                continue
            yielded += 1
            # keep the batch STATIC-SHAPE even when rows were dropped:
            # cycle valid rows to refill (sharding + compile-count both
            # depend on a stable leading dimension)
            k = 0
            while len(wavs) < batch_size:
                wavs.append(wavs[k % len(labels)])
                labels.append(labels[k % len(labels)])
                k += 1
            n = _bucket(max(len(w) for w in wavs), samples_bucket)
            u = _bucket(max(len(l) for l in labels), label_bucket)
            b = len(wavs)
            waveform = np.zeros((b, n), np.float32)
            lengths = np.zeros((b,), np.int32)
            lab = np.zeros((b, u), np.int32)
            lab_len = np.zeros((b,), np.int32)
            for k, (w, l) in enumerate(zip(wavs, labels)):
                waveform[k, : len(w)] = w
                lengths[k] = len(w)
                lab[k, : len(l)] = l
                lab_len[k] = len(l)
            yield {
                "waveform": waveform,
                "lengths": lengths,
                "labels": lab,
                "label_lengths": lab_len,
            }

    if yielded == 0:
        raise ValueError(
            "no batch could be built: every transcription failed to "
            "tokenize with the given tokenizer (vocabulary mismatch?)"
        )
