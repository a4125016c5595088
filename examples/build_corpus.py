"""Build an ASR corpus from a 1seg MPEG-TS recording.

The runnable equivalent of the reference's corpus workflow
(pkg/espnet-oneseg): extract captions, rebuild sentences, force-align each
caption to the audio with the TPU CTC aligner, QC with re-ASR CER, and write
a zip + JSONL manifest.

Usage:
    python examples/build_corpus.py recording.m2ts corpus.zip [optim|lax]

Requires an ffmpeg binary on PATH for M2TS audio extraction.
"""

import sys

from reazonspeech_tpu.espnet.asr import load_model
from reazonspeech_tpu.oneseg import (
    CTCSegmentationAligner,
    get_utterances,
    save_as_zip,
)


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 1
    ts_path, zip_path = sys.argv[1], sys.argv[2]
    strategy = sys.argv[3] if len(sys.argv) > 3 else "optim"

    model = load_model()
    aligner = CTCSegmentationAligner(model)

    utterances = get_utterances(
        ts_path, aligner, speech2text=model, strategy=strategy
    )
    print(f"{len(utterances)} utterances aligned")
    for utt in utterances[:5]:
        print(
            f"  [{utt.start_seconds:8.2f} - {utt.end_seconds:8.2f}] "
            f"ctc={utt.ctc:6.2f} cer={utt.cer} {utt.text[:40]}"
        )

    save_as_zip(utterances, zip_path)
    print(f"wrote {zip_path}")


if __name__ == "__main__":
    sys.exit(main())
