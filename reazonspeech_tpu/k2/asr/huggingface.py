"""Model loading for the k2 flavor.

API parity with the reference loader (pkg/k2-asr/src/huggingface.py:16-83):
the same device/precision/language signature, the same language→model table
and validation errors. The sherpa-onnx recognizer becomes our Zipformer TPU
container; checkpoints come from converted param trees (see
reazonspeech_tpu.convert.onnx_zipformer) located via
$REAZONSPEECH_TPU_K2_CHECKPOINT_DIR/<language>/<precision> or an explicit
``checkpoint=`` path.
"""

import os
import warnings

from .model import K2TPUModel, load_model_container

__all__ = ["load_model", "LANGUAGE_MODELS"]

# language -> (HF repo the weights originate from, training epoch of the
# published checkpoint). Parity: pkg/k2-asr/src/huggingface.py:28-38.
LANGUAGE_MODELS = {
    "ja": ("reazon-research/reazonspeech-k2-v2", 99),
    "ja-en": ("reazon-research/reazonspeech-k2-v2-ja-en", 35),
    "ja-en-mls-5k": ("reazon-research/reazonspeech-k2-v2-ja-en-mls-5k-corrected", 21),
}

PRECISIONS = ("fp32", "int8", "int8-fp32")

CHECKPOINT_DIR_ENV = "REAZONSPEECH_TPU_K2_CHECKPOINT_DIR"


def load_model(device="cpu", precision="fp32", language="ja", checkpoint=None) -> K2TPUModel:
    """Load a ReazonSpeech k2 model.

    Args:
      device (str): accepted for API compatibility; placement is JAX's
      precision (str): "fp32", "int8" or "int8-fp32" (int8 variants load the
        quantization-converted param trees when present)
      language (str): "ja", "ja-en" or "ja-en-mls-5k"
      checkpoint (str): explicit converted-checkpoint path (overrides lookup)

    Returns:
      K2TPUModel
    """
    del device
    if language not in LANGUAGE_MODELS:
        raise ValueError(f"Unknown language: '{language}'")
    if precision not in PRECISIONS:
        raise ValueError("Unknown precision: '%s'" % precision)

    if checkpoint is None:
        basedir = os.environ.get(CHECKPOINT_DIR_ENV)
        if basedir:
            cand = os.path.join(basedir, language, precision)
            if os.path.exists(cand + ".npz"):
                checkpoint = cand
            else:
                warnings.warn(
                    f"no converted checkpoint at {cand}.npz; falling back"
                )
    return load_model_container(checkpoint=checkpoint)
