"""reazonspeech — drop-in compatibility namespace.

Code written against the reference packages imports unchanged:

    from reazonspeech.nemo.asr import load_model, transcribe
    from reazonspeech.k2.asr import load_model, transcribe
    from reazonspeech.espnet.asr import load_model, transcribe
    from reazonspeech.espnet.oneseg import get_captions, get_utterances
    import reazonspeech  # legacy v1 API

Everything re-exports from reazonspeech_tpu (the TPU-native implementation).
"""

from reazonspeech_tpu.v1 import *  # noqa: F401,F403 — legacy v1 surface
from reazonspeech_tpu.v1 import __all__ as _v1_all

__all__ = list(_v1_all)
