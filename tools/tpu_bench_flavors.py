"""espnet + k2 flavor RTFx on one TPU chip, in ONE process.

Companion to bench.py (which owns the nemo headline number). Measures the
full jitted pipeline per flavor with inputs staged in HBM and completion
forced by host materialization (tunnel caveats, CLAUDE.md). Usage:

  python tools/tpu_bench_flavors.py [k2|espnet|all] [batch]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

RNG = np.random.default_rng(0)


def _wavs(batch, seconds, iters):
    n = int(seconds * 16000)
    t = np.arange(n) / 16000.0
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t))
    return [
        RNG.standard_normal((batch, n)).astype(np.float32) * 0.1 * env[None, :]
        for _ in range(iters + 1)
    ], n


def _measure(tag, run, wavs_host, batch, seconds, iters):
    first = jax.device_put(wavs_host[0])
    np.asarray(first[0, :4])
    t0 = time.perf_counter()
    run(first)
    compile_s = time.perf_counter() - t0
    devs = [jax.device_put(w) for w in wavs_host[1:]]
    for w in devs:
        np.asarray(w[0, :4])
    t0 = time.perf_counter()
    for i in range(iters):
        run(devs[i])
    elapsed = time.perf_counter() - t0
    rtfx = batch * seconds * iters / elapsed
    print(f"{tag}: RTFx {rtfx:.0f}  (compile+warmup {compile_s:.1f}s, "
          f"B={batch}x{seconds:.0f}s x{iters})", flush=True)
    return {
        "flavor": tag,
        "rtfx": round(rtfx, 1),
        "batch": batch,
        "chunk_seconds": seconds,
        "iters": iters,
        "compile_s": round(compile_s, 1),
    }


def bench_k2(batch=32, seconds=30.0, iters=4, attn_impl="pallas"):
    from dataclasses import replace

    from reazonspeech_tpu.k2.asr.model import K2TPUModel, k2_forward, load_model_container

    model = load_model_container(checkpoint="random")
    model.enc_cfg = replace(model.enc_cfg, attn_impl=attn_impl)
    wavs, n = _wavs(batch, seconds, iters)
    lengths = jnp.full((batch,), n, jnp.int32)

    def run(w):
        out = k2_forward(model.params, w, lengths, model.fe_cfg, model.enc_cfg,
                         model.rnnt_cfg, model.decode_cfg)
        return np.asarray(out[0]), np.asarray(out[2])

    return _measure(f"k2 zipformer-L ({attn_impl})", run, wavs, batch, seconds, iters)


def bench_espnet(batch=32, seconds=20.0, iters=4, decoding="beam"):
    """decoding="beam" is the serving default (ESPnet default_beam_search,
    width 20 — the reference's own strategy); "greedy" is the fast path."""
    from reazonspeech_tpu.espnet.asr.model import (
        encode_ctc_decode,
        load_model_container,
    )

    model = load_model_container(checkpoint="random", decoding=decoding)
    wavs, n = _wavs(batch, seconds, iters)
    lengths = jnp.full((batch,), n, jnp.int32)

    def run(w):
        out = encode_ctc_decode(model.params, w, lengths, model.fe_cfg,
                                model.enc_cfg, model.rnnt_cfg, model.decode_cfg)
        return np.asarray(out[1]), np.asarray(out[3])

    tag = ("espnet conformer-CTC+T graves-beam-20" if decoding == "beam"
           else f"espnet conformer-CTC+T {decoding}")
    return _measure(tag, run, wavs, batch, seconds, iters)


def bench_avsr(batch=8, seconds=4.0, num_beams=5):
    """AVSR seq2seq: audio+video encode + beam generate (base 12-layer/768
    config, 25 fps, 88x88 mouth ROIs) at production feature shapes."""
    from reazonspeech_tpu.avsr.configuration_avhubert import AVHubertConfig
    from reazonspeech_tpu.avsr.model import AVHubertForConditionalGeneration

    cfg = AVHubertConfig(vocab_size=1000)
    model = AVHubertForConditionalGeneration.init(jax.random.PRNGKey(0), cfg)
    t = int(seconds * cfg.sample_rate)  # 25 fps frames
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((batch, t, cfg.audio_feat_dim), dtype=np.float32))
    video = jnp.asarray(
        rng.standard_normal((batch, t, 88, 88), dtype=np.float32))

    def run(a):
        toks = model.generate(audio=a, video=video, num_beams=num_beams,
                              max_length=64)
        return np.asarray(toks)

    t0 = time.perf_counter()
    run(audio)
    compile_s = time.perf_counter() - t0
    iters = 4
    t0 = time.perf_counter()
    for _ in range(iters):
        run(audio)
    dt = (time.perf_counter() - t0) / iters
    rtfx = batch * seconds / dt
    print(f"avsr AV-HuBERT base (beam={num_beams}): {dt*1e3:.0f} ms for "
          f"B={batch}x{seconds:.0f}s AV -> RTFx {rtfx:.0f} "
          f"(compile {compile_s:.1f}s)", flush=True)
    return {
        "flavor": f"avsr AV-HuBERT base beam-{num_beams}",
        "rtfx": round(rtfx, 1),
        "batch": batch,
        "chunk_seconds": seconds,
        "iters": iters,
        "compile_s": round(compile_s, 1),
    }


def collect_rows(include_avsr=True):
    """All non-nemo flavor rows at their serving shapes, for bench.py's
    BENCH_FLAVORS.json (one TPU process — the driver-visible regression
    net VERDICT r3 asked for). Failures are recorded, not raised, so one
    flavor can't hide the others."""
    specs = [
        ("espnet-beam20", lambda: bench_espnet(128, 20.0, 2, "beam")),
        ("espnet-maes", lambda: bench_espnet(128, 20.0, 2, "maes")),
        ("espnet-greedy", lambda: bench_espnet(256, 20.0, 4, "greedy")),
        ("k2-greedy", lambda: bench_k2(192, attn_impl="pallas")),
    ]
    if include_avsr:
        # B=16 is the documented AVSR serving config (BENCHMARKS.md)
        specs.append(("avsr-beam5", lambda: bench_avsr(16)))
    import gc

    rows = []
    for name, fn in specs:
        try:
            rows.append(fn())
        except Exception as e:  # pragma: no cover - diagnostics only
            print(f"{name}: FAILED {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            rows.append({"flavor": name, "error": f"{type(e).__name__}: {e}"})
        finally:
            # each flavor's params + staged inputs + executables must be off
            # the chip before the next one allocates (16 GB HBM shared
            # across the whole run — round-4 OOM, VERDICT r4 weak #1)
            gc.collect()
            jax.clear_caches()
    return rows


def bench_avsr_sweep(batches=(4, 8, 16, 32), num_beams=5):
    """AVSR batch sweep (VERDICT r3 item 7): find the serving batch size.
    One process, shared weights; returns the per-batch rows."""
    return [bench_avsr(b, num_beams=num_beams) for b in batches]


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    if which == "avsr":
        bench_avsr(batch if len(sys.argv) > 2 else 8)
    if which == "avsr-sweep":
        bench_avsr_sweep()
    if which in ("k2", "all"):
        bench_k2(batch, attn_impl="xla")
        bench_k2(batch, attn_impl="pallas")
    if which in ("espnet", "all"):
        bench_espnet(batch)
