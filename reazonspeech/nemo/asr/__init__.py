from reazonspeech_tpu.nemo.asr import *  # noqa: F401,F403
from reazonspeech_tpu.nemo.asr import __all__  # noqa: F401
