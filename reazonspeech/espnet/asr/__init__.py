from reazonspeech_tpu.espnet.asr import *  # noqa: F401,F403
from reazonspeech_tpu.espnet.asr import __all__  # noqa: F401
