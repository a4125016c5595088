"""Benchmark: long-form Japanese ASR throughput (RTFx) on one TPU chip.

Measures the full jitted pipeline — log-mel frontend → FastConformer-XL
(619M-class, bf16) → label-looping greedy RNN-T — on batched 30 s chunks,
the long-form decode strategy of the nemo-v2 flavor. Prints ONE JSON line:
RTFx = audio seconds transcribed per wall-clock second per chip, against the
1500 RTFx baseline target (BASELINE.md).

Weights are randomly initialized (no egress to fetch the published
checkpoint); wall-clock is weight-independent for the encoder/frontend, and
the decode loop runs its data-dependent emission pattern exactly as it would
with real weights.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from reazonspeech_tpu.decoding.rnnt_greedy import GreedyDecodeConfig
    from reazonspeech_tpu.models.fastconformer import FastConformerConfig
    from reazonspeech_tpu.models.rnnt import RNNTConfig
    from reazonspeech_tpu.nemo.asr.model import asr_forward, init_params
    from reazonspeech_tpu.frontend.features import nemo_frontend_config

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    chunk_seconds = 30.0
    iters = 3

    enc_cfg = FastConformerConfig.xlarge()
    rnnt_cfg = RNNTConfig(enc_dim=enc_cfg.d_model)
    fe_cfg = nemo_frontend_config()
    decode_cfg = GreedyDecodeConfig()

    params = init_params(0, enc_cfg, rnnt_cfg)
    params = jax.device_put(params)

    n = int(chunk_seconds * 16000)
    rng = np.random.default_rng(0)
    # speech-like test signal: band-limited noise with amplitude modulation
    t = np.arange(n) / 16000.0
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t))
    wav = rng.standard_normal((batch, n)).astype(np.float32) * 0.1 * env[None, :]
    waveform = jnp.asarray(wav)
    lengths = jnp.full((batch,), n, jnp.int32)

    def run():
        out = asr_forward(
            params, waveform, lengths, fe_cfg, enc_cfg, rnnt_cfg, decode_cfg
        )
        jax.block_until_ready(out)
        return out

    # compile + warmup
    t0 = time.perf_counter()
    out = run()
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    elapsed = time.perf_counter() - t0

    audio_seconds = batch * chunk_seconds * iters
    rtfx = audio_seconds / elapsed

    counts = np.asarray(out[2])
    print(
        f"# device={jax.devices()[0].device_kind} batch={batch} "
        f"chunk={chunk_seconds}s iters={iters} compile+warmup={compile_s:.1f}s "
        f"decode_emissions(mean)={counts.mean():.1f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "RTFx audio-sec/sec/chip (nemo-v2 619M long-form)",
                "value": round(rtfx, 1),
                "unit": "audio_sec/wall_sec/chip",
                "vs_baseline": round(rtfx / 1500.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
