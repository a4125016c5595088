"""Per-flavor compiled-program HBM report — capacity planning without
running anything.

AOT-compiles each flavor's serving pipeline (``decode_batch_fn``) at a
given (batch, seconds) from ``ShapeDtypeStruct`` args — no waveform or
parameter bytes move, so through the dev tunnel this costs one
remote-compile round-trip per flavor — and prints XLA's memory analysis:
argument (params + staged batch), temp (activations/workspaces), output,
and generated-code sizes, plus headroom against the chip's HBM.

This is the first-class version of the ad-hoc analysis that retired the
round-2 "k2 B=128 exceeds HBM" belief (the real limit was the old
attention's score materialization — BENCHMARKS.md); use it before
changing a serving batch size. The reference has no analogue: its
capacity planning is trial-and-error against torch.cuda OOMs.

Usage: python tools/tpu_memory_report.py [nemo|espnet|k2|all] [batch] [seconds]
"""

import json
import sys

HBM_BYTES = 16 * 2**30  # v5e


def report(model, batch, seconds, flavor="?"):
    """AOT-compile model.decode_batch_fn() at [batch, seconds*16k] and
    return XLA's memory analysis as a dict (one JSON line printed)."""
    import jax
    import jax.numpy as jnp

    fn = model.decode_batch_fn()
    shape = lambda s, dt: jax.ShapeDtypeStruct(s, dt)  # noqa: E731
    params = jax.tree.map(
        lambda x: shape(jnp.shape(x), jnp.asarray(x).dtype), model.params)
    n = int(seconds * 16000)
    compiled = (
        jax.jit(fn)
        .lower(params, shape((batch, n), jnp.float32),
               shape((batch,), jnp.int32))
        .compile()
    )
    ma = compiled.memory_analysis()
    gb = 2**30
    row = {
        "flavor": flavor,
        "batch": batch,
        "seconds": seconds,
        "argument_gb": round(ma.argument_size_in_bytes / gb, 3),
        "temp_gb": round(ma.temp_size_in_bytes / gb, 3),
        "output_gb": round(ma.output_size_in_bytes / gb, 3),
        "code_mb": round(ma.generated_code_size_in_bytes / 2**20, 1),
    }
    total = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
             + ma.output_size_in_bytes + ma.generated_code_size_in_bytes)
    row["total_gb"] = round(total / gb, 3)
    row["headroom_gb"] = round((HBM_BYTES - total) / gb, 3)
    print(json.dumps(row), flush=True)
    return row


def _load(flavor):
    if flavor == "nemo":
        from reazonspeech_tpu.nemo.asr.model import load_model

        return load_model(checkpoint="random")
    if flavor == "espnet":
        from reazonspeech_tpu.espnet.asr.model import load_model_container

        return load_model_container(checkpoint="random")
    from reazonspeech_tpu.k2.asr.model import load_model_container

    return load_model_container(checkpoint="random")


def main(which="all", batch=None, seconds=None):
    import jax

    defaults = {"nemo": (144, 30.0), "espnet": (128, 20.0),
                "k2": (192, 30.0)}
    flavors = list(defaults) if which == "all" else [which]
    for flavor in flavors:
        b, s = defaults[flavor]
        model = _load(flavor)
        report(model, int(batch or b), float(seconds or s), flavor)
        del model
        jax.clear_caches()  # free each flavor before the next (bench-OOM rule)


if __name__ == "__main__":
    main(*(sys.argv[1:4] or ["all"]))
