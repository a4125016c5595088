"""Benchmark: long-form Japanese ASR throughput (RTFx) on one TPU chip.

Measures the full jitted pipeline — log-mel frontend → FastConformer-XL
(619M-class, bf16) → ALSD beam-4 RNN-T (the SERVING DEFAULT, matching the
reference's NeMo decode strategy; oracle-gated in tools/convert_and_gate.py)
— on batched 30 s chunks, the long-form decode strategy of the nemo-v2
flavor. Prints ONE JSON line: RTFx = audio seconds transcribed per
wall-clock second per chip, against the 1500 RTFx baseline target
(BASELINE.md). The greedy-decode RTFx is measured in the same process and
reported on stderr.

Methodology notes:
- The metric times the on-chip pipeline with inputs staged in HBM and forces
  completion by materializing the emission buffers on the host. In this dev
  environment the chip sits behind a network tunnel with ~0.4 s fixed latency
  and ~41 MB/s bandwidth per transfer; an end-to-end number including that
  tunnel upload is printed to stderr for transparency (on production hardware
  host->HBM is PCIe/local and adds <2% at these sizes).
- Weights are randomly initialized (no egress to fetch the published
  checkpoint); encoder/frontend wall-clock is weight-independent, and the
  decodes run their worst case here (random logits emit maximally, so
  real-weight decode is never slower than measured).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: repeat bench runs skip the ~50 s compile
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from reazonspeech_tpu.decoding.rnnt_beam import BeamDecodeConfig
    from reazonspeech_tpu.decoding.rnnt_greedy import GreedyDecodeConfig
    from reazonspeech_tpu.frontend.features import nemo_frontend_config
    from reazonspeech_tpu.models.fastconformer import FastConformerConfig
    from reazonspeech_tpu.models.rnnt import RNNTConfig
    from reazonspeech_tpu.nemo.asr.model import asr_forward, init_params

    # Round-5 sweep over the HBM headroom tpu_memory_report exposed:
    # B=144 6182 / B=192 6232 / B=256 6458 RTFx. 256 is the measured peak
    # but pushes staging past 14 GB (host->device uploads degrade 10x on
    # the dev tunnel under that pressure); 192 keeps clean staging and is
    # the serving/bench default.
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    chunk_seconds = 30.0
    iters = 4

    # Serving defaults: Pallas attention, fp32 residual stream (bf16 residual
    # flips greedy tokens at depth — parity-gated off; see PARITY_GATE.json.
    # $REAZONSPEECH_TPU_RESIDUAL_DTYPE=bfloat16 opts back in for comparison).
    import os

    enc_cfg = FastConformerConfig.xlarge(
        attn_impl="pallas",
        conv_impl="pallas",
        lnd_impl="pallas",
        residual_dtype=os.environ.get("REAZONSPEECH_TPU_RESIDUAL_DTYPE", "float32"),
    )
    rnnt_cfg = RNNTConfig(enc_dim=enc_cfg.d_model)
    fe_cfg = nemo_frontend_config()
    # ALSD beam 4 with the fused top-m kernel — the serving default
    # (what load_model builds on a TPU backend)
    decode_cfg = BeamDecodeConfig(topk_impl="pallas")
    greedy_cfg = GreedyDecodeConfig()

    params = jax.device_put(init_params(0, enc_cfg, rnnt_cfg))
    # force client init + param materialization before any timing
    np.asarray(jax.tree.leaves(params)[0]).ravel()[:1]

    n = int(chunk_seconds * 16000)
    rng = np.random.default_rng(0)
    # speech-like test signal: band-limited noise with amplitude modulation,
    # a distinct batch per iteration so nothing can be result-cached
    t = np.arange(n) / 16000.0
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t))
    wavs_host = [
        rng.standard_normal((batch, n)).astype(np.float32) * 0.1 * env[None, :]
        for _ in range(iters + 1)
    ]
    lengths = jnp.full((batch,), n, jnp.int32)

    def run(wav_dev, cfg=decode_cfg):
        out = asr_forward(
            params, wav_dev, lengths, fe_cfg, enc_cfg, rnnt_cfg, cfg
        )
        # completion forced by host materialization (block_until_ready does
        # not reliably block on tunneled backends)
        return np.asarray(out[0]), np.asarray(out[2])

    # measure one tunnel upload for the e2e transparency number
    t0 = time.perf_counter()
    first = jax.device_put(wavs_host[0])
    np.asarray(first[0, :4])
    upload_s = time.perf_counter() - t0

    # compile + warmup
    t0 = time.perf_counter()
    out = run(first)
    compile_s = time.perf_counter() - t0

    # stage remaining inputs in HBM
    wavs_dev = [jax.device_put(w) for w in wavs_host[1:]]
    for w in wavs_dev:
        np.asarray(w[0, :4])

    t0 = time.perf_counter()
    for i in range(iters):
        out = run(wavs_dev[i])
    elapsed = time.perf_counter() - t0

    audio_seconds = batch * chunk_seconds * iters
    rtfx = audio_seconds / elapsed
    e2e_rtfx = audio_seconds / (elapsed + upload_s * iters)

    # greedy comparison number, same process (fast path, opt-in decode)
    run(wavs_dev[0], greedy_cfg)  # compile + warmup
    t0 = time.perf_counter()
    for i in range(iters):
        gout = run(wavs_dev[i], greedy_cfg)
    greedy_rtfx = audio_seconds / (time.perf_counter() - t0)

    counts = np.asarray(out[1])
    print(
        f"# device={jax.devices()[0].device_kind} batch={batch} "
        f"chunk={chunk_seconds}s iters={iters} compile+warmup={compile_s:.1f}s "
        f"upload/batch={upload_s:.2f}s e2e_rtfx_incl_tunnel={e2e_rtfx:.0f} "
        f"greedy_rtfx={greedy_rtfx:.0f} "
        f"decode_emissions(mean)={counts.mean():.1f}",
        file=sys.stderr,
    )

    # ---- all-flavor regression net (VERDICT r3 item 4): espnet beam-20 +
    # greedy, k2, and AVSR measured in THIS process (the tunnel grant is
    # exclusive — CLAUDE.md) and recorded driver-visibly.
    rows = [
        {
            "flavor": "nemo FastConformer-XL ALSD-beam-4 (headline)",
            "rtfx": round(rtfx, 1),
            "batch": batch,
            "chunk_seconds": chunk_seconds,
            "iters": iters,
            "compile_s": round(compile_s, 1),
        },
        {
            "flavor": "nemo FastConformer-XL greedy",
            "rtfx": round(greedy_rtfx, 1),
            "batch": batch,
            "chunk_seconds": chunk_seconds,
            "iters": iters,
        },
    ]
    skip_flavors = os.environ.get("REAZONSPEECH_TPU_BENCH_HEADLINE_ONLY")
    if not skip_flavors:
        # Release the nemo 619M param tree (~2.5 GB fp32), the four staged
        # 192x480000 waveform batches (~2.9 GB), and both compiled ALSD +
        # greedy executables before the other flavors allocate on the same
        # 16 GB chip — round 4 OOM'd espnet-greedy/k2/avsr by keeping these
        # alive across collect_rows (VERDICT r4 weak #1).
        import gc

        del params, wavs_dev, first, out, gout, run
        gc.collect()
        jax.clear_caches()
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        try:
            from tpu_bench_flavors import collect_rows

            rows += collect_rows()
        except Exception as e:  # flavor rows must never sink the headline
            print(f"# flavor bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    if not skip_flavors:  # a headline-only sweep must not clobber the
        # full regression net the driver reads
        out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH_FLAVORS.json")
        with open(out_path, "w") as f:
            json.dump({"device": jax.devices()[0].device_kind,
                       "rows": rows}, f, indent=1)
    for r in rows:
        print(f"# flavor: {r}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "RTFx audio-sec/sec/chip (nemo-v2 619M long-form, "
                          "ALSD beam-4 serving default)",
                "value": round(rtfx, 1),
                "unit": "audio_sec/wall_sec/chip",
                "vs_baseline": round(rtfx / 1500.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
