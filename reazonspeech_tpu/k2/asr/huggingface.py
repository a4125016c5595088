"""Model loading for the k2 flavor.

API parity with the reference loader (pkg/k2-asr/src/huggingface.py:16-83):
the same device/precision/language signature, the same language→model table,
file-name tables and validation errors, and the same offline-first HF-hub
resolution (snapshot from the local cache before any network attempt,
pkg/k2-asr/src/huggingface.py:68-71). The sherpa-onnx recognizer becomes our
Zipformer TPU container; the published ONNX decoder/joiner graphs (fp32 or
int8 per ``precision``) convert directly, the encoder converts from the
icefall .pt next to them (the traced encoder ONNX is constant-folded).

Resolution order: explicit ``checkpoint=`` >
$REAZONSPEECH_TPU_K2_CHECKPOINT_DIR/<language>/<precision> > converted-tree
cache > HF snapshot (auto-converted). ``checkpoint="random"`` opts into a
randomly initialized model; with nothing resolvable this raises
CheckpointNotFoundError instead of silently serving random weights.
"""

import glob
import os

from ...core.hub import CheckpointNotFoundError, resolve_converted
from .model import K2TPUModel, load_model_container

__all__ = ["load_model", "LANGUAGE_MODELS", "hf_repo_files"]

# language -> (HF repo the weights originate from, training epoch of the
# published checkpoint). Parity: pkg/k2-asr/src/huggingface.py:28-38.
LANGUAGE_MODELS = {
    "ja": ("reazon-research/reazonspeech-k2-v2", 99),
    "ja-en": ("reazon-research/reazonspeech-k2-v2-ja-en", 35),
    "ja-en-mls-5k": ("reazon-research/reazonspeech-k2-v2-ja-en-mls-5k-corrected", 21),
}

PRECISIONS = ("fp32", "int8", "int8-fp32")

CHECKPOINT_DIR_ENV = "REAZONSPEECH_TPU_K2_CHECKPOINT_DIR"


def hf_repo_files(precision, epochs):
    """Published file names per precision (pkg/k2-asr/src/huggingface.py:40-59)."""
    files = {
        "fp32": {
            "tokens": "tokens.txt",
            "encoder": f"encoder-epoch-{epochs}-avg-1.onnx",
            "decoder": f"decoder-epoch-{epochs}-avg-1.onnx",
            "joiner": f"joiner-epoch-{epochs}-avg-1.onnx",
        },
        "int8": {
            "tokens": "tokens.txt",
            "encoder": f"encoder-epoch-{epochs}-avg-1.int8.onnx",
            "decoder": f"decoder-epoch-{epochs}-avg-1.int8.onnx",
            "joiner": f"joiner-epoch-{epochs}-avg-1.int8.onnx",
        },
        "int8-fp32": {
            "tokens": "tokens.txt",
            "encoder": f"encoder-epoch-{epochs}-avg-1.int8.onnx",
            "decoder": f"decoder-epoch-{epochs}-avg-1.onnx",
            "joiner": f"joiner-epoch-{epochs}-avg-1.int8.onnx",
        },
    }
    return files[precision]


def _make_converter(precision, epochs):
    files = hf_repo_files(precision, epochs)

    def convert(snapshot_dir, out_base):
        from ...convert.onnx_zipformer import convert_sherpa_snapshot

        def find(name):
            p = os.path.join(snapshot_dir, name)
            if os.path.exists(p):
                return p
            hits = glob.glob(os.path.join(snapshot_dir, "**", name), recursive=True)
            return hits[0] if hits else None

        enc, dec, joi = (find(files[k]) for k in ("encoder", "decoder", "joiner"))
        if not (enc and dec and joi):
            raise CheckpointNotFoundError(
                f"snapshot {snapshot_dir} is missing the {precision} ONNX "
                f"files {sorted(files.values())}"
            )
        tokens = find(files["tokens"])
        if tokens is None:
            raise CheckpointNotFoundError(
                f"snapshot {snapshot_dir} has no {files['tokens']} — the "
                "published repos always ship it; without it decoded ids "
                "cannot be mapped to symbols"
            )
        pts = sorted(
            glob.glob(os.path.join(snapshot_dir, "**", "*.pt"), recursive=True),
            # prefer the averaged/pretrained export over raw epoch files
            key=lambda p: ("pretrained" not in p, "avg" not in p, p),
        )
        convert_sherpa_snapshot(
            enc, dec, joi, out_base,
            tokens_txt=tokens,
            icefall_pt=pts[0] if pts else None,
        )

    return convert


def load_model(device="cpu", precision="fp32", language="ja", checkpoint=None,
               decoding=None) -> K2TPUModel:
    """Load a ReazonSpeech k2 model.

    Args:
      device (str): accepted for API compatibility; placement is JAX's
      precision (str): "fp32", "int8" or "int8-fp32" (int8 variants convert
        the published quantized decoder/joiner graphs)
      language (str): "ja", "ja-en" or "ja-en-mls-5k"
      checkpoint (str): explicit converted-checkpoint path, or "random"
      decoding (str): "greedy" (the reference's pinned strategy, default)
        or "beam"; None keeps the container default

    Returns:
      K2TPUModel
    """
    del device
    if language not in LANGUAGE_MODELS:
        raise ValueError(f"Unknown language: '{language}'")
    if precision not in PRECISIONS:
        raise ValueError("Unknown precision: '%s'" % precision)

    # the container-level env var names one converted tree directly
    checkpoint = checkpoint or os.environ.get("REAZONSPEECH_TPU_K2_CHECKPOINT")
    if checkpoint is None:
        basedir = os.environ.get(CHECKPOINT_DIR_ENV)
        if basedir:
            cand = os.path.join(basedir, language, precision)
            if os.path.exists(cand + ".npz"):
                checkpoint = cand
            else:
                raise CheckpointNotFoundError(
                    f"${CHECKPOINT_DIR_ENV}={basedir} is set but "
                    f"{cand}.npz does not exist"
                )
    if checkpoint is None:
        repo_id, epochs = LANGUAGE_MODELS[language]
        checkpoint = resolve_converted(
            repo_id, precision, _make_converter(precision, epochs)
        )
    if decoding is None:
        return load_model_container(checkpoint=checkpoint)
    return load_model_container(checkpoint=checkpoint, decoding=decoding)
