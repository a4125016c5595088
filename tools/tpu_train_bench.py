"""Training-step throughput on one TPU chip (the reference ships no trainer;
SURVEY.md §4 — this measures the beyond-reference training subsystem).

Times the full jitted RNN-T train step — waveform → log-mel → FastConformer
(remat) → predictor/joint → transducer loss (diagonal-wavefront scan) →
AdamW update — and prints audio-seconds/second and steps/s. With loss=full the joint
materializes [B, T, U, V] logits, the usual RNN-T memory wall, so batch and
clip length are modest on a single 16 GB chip; loss=pruned trains the
icefall-style simple+pruned objective (training/pruned_rnnt.py) whose peak
activation is the [B, T, s_range, V] band, which lifts that bound.

Usage: python tools/tpu_train_bench.py [batch] [seconds] [u_labels] [full|pruned]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    import optax

    from reazonspeech_tpu.frontend.features import nemo_frontend_config
    from reazonspeech_tpu.models.fastconformer import FastConformerConfig
    from reazonspeech_tpu.models.rnnt import RNNTConfig
    from reazonspeech_tpu.nemo.asr.model import init_params
    from reazonspeech_tpu.training.train_step import make_train_step

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 15.0
    u = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    loss = sys.argv[4] if len(sys.argv) > 4 else "full"
    iters = 8

    fe_cfg = nemo_frontend_config()
    enc_cfg = FastConformerConfig.xlarge(remat=True)
    rnnt_cfg = RNNTConfig(enc_dim=enc_cfg.d_model)
    print(f"device: {jax.devices()[0].device_kind}  B={batch} x {seconds:.0f}s "
          f"U={u} loss={loss} (619M, bf16 matmuls, remat)", flush=True)

    params = init_params(0, enc_cfg, rnnt_cfg)
    if loss == "pruned":
        from reazonspeech_tpu.training.pruned_rnnt import init_simple_joint

        params["simple_joint"] = init_simple_joint(
            jax.random.PRNGKey(1), rnnt_cfg)
    init_state, step_fn = make_train_step(
        fe_cfg, enc_cfg, rnnt_cfg,
        optimizer=optax.adamw(1e-4, weight_decay=1e-2), loss=loss)
    step_fn = jax.jit(step_fn, donate_argnums=(0,))
    state = init_state(params)

    rng = np.random.default_rng(0)
    n = int(seconds * 16000)
    batch_data = {
        "waveform": jnp.asarray(
            rng.standard_normal((batch, n), dtype=np.float32) * 0.1),
        "lengths": jnp.full((batch,), n, jnp.int32),
        "labels": jnp.asarray(
            rng.integers(0, rnnt_cfg.vocab_size, (batch, u), dtype=np.int64),
            jnp.int32),
        "label_lengths": jnp.full((batch,), u, jnp.int32),
    }

    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch_data)
    loss = np.asarray(metrics["loss"])
    print(f"compile+step0: {time.perf_counter()-t0:.1f}s loss={float(loss):.3f}",
          flush=True)

    # steps chain on device state; materialize ONLY the last loss so the
    # tunnel's fixed dispatch round-trip is paid once, not per step
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, batch_data)
    loss = np.asarray(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    audio_per_s = batch * seconds / dt
    print(f"step: {dt*1e3:.0f} ms  ({1/dt:.2f} steps/s, "
          f"{audio_per_s:.0f} audio-sec/s/chip, loss={float(loss):.3f})",
          flush=True)


if __name__ == "__main__":
    main()
