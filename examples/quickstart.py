"""Quickstart: transcribe an audio file with the nemo-v2 flavor.

The runnable equivalent of the reference's colab notebooks
(colab/ReazonSpeech_v2_0{,_en}.ipynb): load model → load audio → transcribe →
print text and per-segment timestamps.

Usage:
    python examples/quickstart.py sample.wav

Set $REAZONSPEECH_TPU_NEMO_CHECKPOINT to a converted checkpoint for real
transcription; without it a randomly initialized model demonstrates the
pipeline. Set REAZONSPEECH_TPU_MODEL_SIZE=tiny for a fast smoke run.
"""

import sys

from reazonspeech_tpu.nemo.asr import audio_from_path, load_model, transcribe


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1

    audio = audio_from_path(sys.argv[1])
    model = load_model()
    ret = transcribe(model, audio)

    print(ret.text)
    print()
    for seg in ret.segments:
        print(f"[{seg.start_seconds:7.2f} --> {seg.end_seconds:7.2f}] {seg.text}")


if __name__ == "__main__":
    sys.exit(main())
