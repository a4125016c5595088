"""Subprocess helper for the SIGTERM graceful-drain test: runs the real
``serve()`` entry (main thread, so signal handlers install) on a tiny
random-weight nemo model. Usage: python _tiny_server.py PORT [WAIT_MS]."""

import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

from reazonspeech_tpu.models.fastconformer import FastConformerConfig
from reazonspeech_tpu.models.rnnt import RNNTConfig
from reazonspeech_tpu.nemo.asr.model import load_model
from reazonspeech_tpu.serving.http import serve

if __name__ == "__main__":
    port = int(sys.argv[1])
    wait_ms = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    enc = FastConformerConfig.tiny(compute_dtype="float32")
    rnnt = RNNTConfig.tiny(enc_dim=enc.d_model, compute_dtype="float32")
    model = load_model(checkpoint="random", enc_cfg=enc, rnnt_cfg=rnnt)
    serve(model, "127.0.0.1", port, max_batch=2, max_wait_ms=wait_ms)
