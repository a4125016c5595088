from reazonspeech_tpu.k2.asr import *  # noqa: F401,F403
from reazonspeech_tpu.k2.asr import __all__  # noqa: F401
