"""reazonspeech_tpu — a TPU-native Japanese ASR framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
reazon-research/ReazonSpeech: first-party Conformer/FastConformer/Zipformer
encoders, RNN-T/CTC decoding as on-device scan loops, a fused audio frontend,
subtitle writers, a CER evaluation harness, MPEG-TS corpus tooling, and an
audio-visual (AVHuBERT-style) model family.

Public API entry points mirror the reference's package layout:

    reazonspeech_tpu.nemo.asr     — FastConformer-RNNT (619M) long-form ASR
    reazonspeech_tpu.k2.asr       — Zipformer transducer (159M), incl. ja-en
    reazonspeech_tpu.espnet.asr   — Conformer-Transducer (120M) chunked ASR
    reazonspeech_tpu.evaluation   — CER evaluation harness
    reazonspeech_tpu.oneseg       — 1seg TV stream corpus pipeline
    reazonspeech_tpu.avsr         — audio-visual ASR
"""

__version__ = "3.0.0"
