"""Serving cold-start measurement: warmup() of a flavor's bucket-program
set with the persistent compile cache cold vs warm.

The reference pays model-load at process start and compiles nothing
(torch eager / ONNX sessions, pkg/nemo-asr/src/transcribe.py:18-34); a
TPU serving process instead pays one XLA compilation per program
signature. This tool quantifies that cost and what
``utils/compile_cache.py`` + ``MicroBatcher.warmup()`` recover across a
restart.

Run twice, sequentially, with the same DIR (never two TPU processes at
once on the dev tunnel):

    python tools/tpu_cold_start_bench.py cold /tmp/rs_cache
    python tools/tpu_cold_start_bench.py warm /tmp/rs_cache

Prints one JSON line per run; `warmup_s` cold-vs-warm is the restart win.
Only the warmup() call is timed — the device is claimed by a trivial op
first, so tunnel/claim stalls don't pollute the number.
"""

import glob
import json
import os
import sys
import time


def main(run, cachedir, flavor="nemo", max_batch=8, seconds=20.0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from reazonspeech_tpu.utils.compile_cache import enable_compile_cache

    assert enable_compile_cache(cachedir, min_compile_secs=0.0)
    np.asarray(jnp.ones(8) + 1)  # claim the device / pay tunnel fixed cost

    if flavor == "nemo":
        from reazonspeech_tpu.nemo.asr.model import load_model
    elif flavor == "espnet":
        from reazonspeech_tpu.espnet.asr.model import (
            load_model_container as load_model,
        )
    else:
        from reazonspeech_tpu.k2.asr.model import (
            load_model_container as load_model,
        )
    from reazonspeech_tpu.serving import MicroBatcher

    model = load_model(checkpoint="random")
    mb = MicroBatcher(model, max_batch=max_batch, max_wait_ms=5.0)
    t0 = time.perf_counter()
    warmed = mb.warmup(seconds=seconds)
    dt = time.perf_counter() - t0
    mb.close()
    n = sum(os.path.isfile(p)
            for p in glob.glob(cachedir + "/**", recursive=True))
    print(json.dumps({"run": run, "flavor": flavor,
                      "warmup_s": round(dt, 1), "programs": len(warmed),
                      "cache_entries": n}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *(sys.argv[3:4] or ["nemo"]))
