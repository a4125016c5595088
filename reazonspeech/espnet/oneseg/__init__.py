from reazonspeech_tpu.oneseg import *  # noqa: F401,F403
from reazonspeech_tpu.oneseg import __all__  # noqa: F401
