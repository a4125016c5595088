"""Serving latency/throughput on one TPU chip: the micro-batching executor
under concurrent load (reazonspeech_tpu/serving/batcher.py — the layer
`reazonspeech-serve` wraps in HTTP).

Submits N concurrent transcribe requests of mixed-length WAV-rate waveforms
straight into the MicroBatcher (no HTTP, no tunnel-upload accounting per
request — inputs are staged host-side exactly as the server would hold
them) and reports p50/p95/p99 latency and sustained audio-seconds/second.

NOTE dev-environment caveat: the chip sits behind a network tunnel with
~0.4 s fixed transfer latency per device_put/materialization; per-request
latency here includes tunnel hops that production (local PCIe) does not pay.
Throughput remains meaningful because requests coalesce into batches.

Usage:
  python tools/tpu_serving_bench.py [n_requests] [concurrency] [max_batch]
  python tools/tpu_serving_bench.py continuous [n_requests] [n_lanes] \
      [frames_per_segment] [--nemo | --k2] [--blank-bias=X]
      # default flavor: espnet beam-20; --nemo = ALSD beam-4 lane pool,
      # --k2 = zipformer greedy lane pool. --blank-bias adds X to the
      # joint's blank logit bias: plain random weights emit at the cap
      # every frame (the worst case); biasing the blank models realistic
      # sparse emission density (trained Japanese ASR emits well under 1
      # token per frame), which is what the flavor RTFx table measures.

The ``continuous`` mode is the espnet beam-20 A/B the round-3 verdict asked
for: the same mixed-length traffic through (a) the static MicroBatcher —
every tick's batch runs until its SLOWEST element finishes its pop loop —
and (b) the lane-recycling ContinuousBatcher (serving/continuous.py), which
refills finished lanes mid-flight. Reports goodput (audio-sec/s == RTFx)
for both and cross-checks token parity on sampled requests.
"""

import sys
import threading
import time

import numpy as np


def main():
    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    conc = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    max_batch = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from reazonspeech_tpu.nemo.asr import load_model
    from reazonspeech_tpu.serving.batcher import MicroBatcher

    print(f"device: {jax.devices()[0].device_kind}  requests={n_req} "
          f"concurrency={conc} max_batch={max_batch}", flush=True)
    model = load_model(checkpoint="random")

    rng = np.random.default_rng(0)
    secs = rng.choice([2.0, 5.0, 10.0, 15.0], size=n_req,
                      p=[0.3, 0.35, 0.25, 0.1])
    wavs = [rng.standard_normal(int(s * 16000)).astype(np.float32) * 0.1
            for s in secs]
    audio_total = float(np.sum(secs))

    batcher = MicroBatcher(model, max_batch=max_batch)
    # warm the bucketed programs (compile) before timing
    for s in (2.0, 5.0, 10.0, 15.0):
        batcher.transcribe(rng.standard_normal(int(s * 16000))
                           .astype(np.float32) * 0.1)

    lat = [None] * n_req
    sem = threading.Semaphore(conc)
    done = []

    def worker(i):
        t0 = time.perf_counter()
        batcher.transcribe(wavs[i])
        lat[i] = time.perf_counter() - t0
        sem.release()

    t0 = time.perf_counter()
    threads = []
    for i in range(n_req):
        sem.acquire()
        th = threading.Thread(target=worker, args=(i,))
        th.start()
        threads.append(th)
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0
    batcher.close()

    lat_ms = np.array(lat) * 1e3
    print(f"wall {wall:.2f}s  throughput {audio_total/wall:.0f} audio-sec/s "
          f"({n_req/wall:.1f} req/s)", flush=True)
    print(f"latency ms: p50 {np.percentile(lat_ms,50):.0f}  "
          f"p95 {np.percentile(lat_ms,95):.0f}  "
          f"p99 {np.percentile(lat_ms,99):.0f}  max {lat_ms.max():.0f}",
          flush=True)
    from collections import Counter

    shapes = Counter(batcher.batch_shapes)
    print(f"ticks: {len(batcher.batch_shapes)}  mean batch "
          f"{np.mean(batcher.batch_sizes):.1f}  dispatched shapes "
          f"{dict(shapes)} (bounded program set)", flush=True)
    print("NOTE: per-request latency in THIS dev environment is dominated by "
          "the tunnel's ~0.4 s fixed hop + ~41 MB/s host->HBM per tick; see "
          "bench.py for the chip-side throughput the batch dimension buys.",
          flush=True)


def main_continuous():
    args = [a for a in sys.argv[2:] if not a.startswith("--")]
    flavor = ("nemo" if "--nemo" in sys.argv
              else "k2" if "--k2" in sys.argv else "espnet")
    blank_bias = next((float(a.split("=", 1)[1]) for a in sys.argv
                       if a.startswith("--blank-bias=")), 0.0)
    n_req = int(args[0]) if len(args) > 0 else 256
    n_lanes = int(args[1]) if len(args) > 1 else 128
    n_frames = int(args[2]) if len(args) > 2 else 64

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from reazonspeech_tpu.serving import ContinuousBatcher, MicroBatcher

    print(f"device: {jax.devices()[0].device_kind}  flavor={flavor} "
          f"requests={n_req} lanes={n_lanes} quantum/segment={n_frames}",
          flush=True)

    # one shared emission cap (the continuous pool's 20 s buffer) so both
    # executors run the same search bounds and parity is well-defined
    from dataclasses import replace

    from reazonspeech_tpu.frontend.features import num_frames
    from reazonspeech_tpu.models.fastconformer import encoder_output_length

    if flavor == "nemo":
        from reazonspeech_tpu.decoding.rnnt_beam import alsd_step_bound
        from reazonspeech_tpu.nemo.asr.model import load_model

        model = load_model(checkpoint="random")  # ALSD beam-4 default
        t_buf = int(encoder_output_length(
            num_frames(model.fe_cfg, int(20.0 * 16000)), model.enc_cfg))
        model.decode_cfg = replace(
            model.decode_cfg,
            max_tokens=alsd_step_bound(t_buf, model.decode_cfg))
    elif flavor == "k2":
        from reazonspeech_tpu.k2.asr.model import load_model_container
        from reazonspeech_tpu.models.zipformer import zipformer_output_length

        model = load_model_container(checkpoint="random")  # pinned greedy
        t_buf = int(zipformer_output_length(
            num_frames(model.fe_cfg, int(20.0 * 16000)), model.enc_cfg))
        model.decode_cfg = replace(model.decode_cfg, max_tokens=t_buf)
    else:
        from reazonspeech_tpu.espnet.asr.model import load_model_container

        # default: graves beam-20 (the serving default); --maes switches to
        # the alignment-synchronous opt-in (decoding/transducer_maes.py)
        dec = "maes" if "--maes" in sys.argv else "beam"
        model = load_model_container(checkpoint="random", decoding=dec)
        t_buf = int(encoder_output_length(
            num_frames(model.fe_cfg, int(20.0 * 16000)), model.enc_cfg))
        model.decode_cfg = replace(model.decode_cfg, max_tokens=t_buf)

    if blank_bias:
        jb = model.params["joint"]["out"]["b"]
        model.params["joint"]["out"]["b"] = jb.at[
            model.rnnt_cfg.blank_id].add(blank_bias)
        print(f"blank bias +{blank_bias} on the joint output (sparse "
              f"realistic emissions instead of cap-every-frame)", flush=True)

    # mixed-length traffic on a coarse bucket grid (4 waveform buckets keeps
    # the encode program set small; see ContinuousBatcher.max_encode_batch)
    rng = np.random.default_rng(0)
    secs = rng.choice([4.0, 8.0, 12.0, 20.0], size=n_req,
                      p=[0.35, 0.3, 0.2, 0.15])
    wavs = [rng.standard_normal(int(s * 16000)).astype(np.float32) * 0.1
            for s in secs]
    audio_total = float(np.sum(secs))
    print(f"traffic: {audio_total:.0f} audio-sec over {n_req} requests "
          f"(mean {audio_total/n_req:.1f}s)", flush=True)

    # ---- (a) static micro-batching baseline --------------------------------
    static = MicroBatcher(model, max_batch=n_lanes, max_wait_ms=100.0)
    for s in (4.0, 8.0, 12.0, 20.0):  # compile the buckets untimed
        static.transcribe(rng.standard_normal(int(s * 16000))
                          .astype(np.float32) * 0.1)
    t0 = time.perf_counter()
    futs = [static.submit(w) for w in wavs]
    static_out = [f.result(timeout=3600) for f in futs]
    static_wall = time.perf_counter() - t0
    static.close()
    print(f"static  micro-batching: wall {static_wall:.1f}s  goodput "
          f"{audio_total/static_wall:.0f} audio-sec/s  "
          f"ticks={len(static.batch_shapes)}", flush=True)

    # ---- (a2) static at the lane pool's FIXED encode shape ------------------
    # program-identical shape experiment: every tick dispatches
    # (max_encode_batch, max_samples) — the exact shape the continuous
    # pool's fixed_encode_shape encoder runs — so any token diff between
    # (a) and (a2) is re-bucketing numerics alone (same executor, same
    # scheduling, only the padded XLA program differs)
    enc_b = 16  # ContinuousBatcher default max_encode_batch
    max_samples = int(20.0 * 16000)
    bucket = getattr(model, "bucket_samples", 2 * 16000)
    max_samples = int(-(-max_samples // bucket) * bucket)
    fixed = MicroBatcher(model, max_wait_ms=100.0,
                         fixed_shape=(enc_b, max_samples))
    fixed.transcribe(rng.standard_normal(int(4.0 * 16000))
                     .astype(np.float32) * 0.1)  # compile untimed
    t0 = time.perf_counter()
    futs = [fixed.submit(w) for w in wavs]
    fixed_out = [f.result(timeout=3600) for f in futs]
    fixed_wall = time.perf_counter() - t0
    fixed.close()
    print(f"static  fixed-shape ({enc_b}x{max_samples/16000:.0f}s ticks): "
          f"wall {fixed_wall:.1f}s  goodput {audio_total/fixed_wall:.0f} "
          f"audio-sec/s  ticks={len(fixed.batch_shapes)}", flush=True)

    # ---- (b) continuous batching -------------------------------------------
    cont = ContinuousBatcher(model, n_lanes=n_lanes,
                             frames_per_segment=n_frames, max_seconds=20.0)
    cont.warmup(seconds=(4.0, 8.0, 12.0, 20.0))
    t0 = time.perf_counter()
    futs = [cont.submit(w) for w in wavs]
    cont_out = [f.result(timeout=3600) for f in futs]
    cont_wall = time.perf_counter() - t0
    print(f"continuous batching:    wall {cont_wall:.1f}s  goodput "
          f"{audio_total/cont_wall:.0f} audio-sec/s  "
          f"segments={cont.segments} encode_ticks={cont.encode_ticks}",
          flush=True)
    print(f"speedup: {static_wall/cont_wall:.2f}x  (continuous RTFx "
          f"{audio_total/cont_wall:.0f} vs static {audio_total/static_wall:.0f})",
          flush=True)

    # token parity on sampled requests. Scheduling ground truth: replay each
    # sampled request SOLO through the SAME batcher instance — identical
    # compiled programs (the pool's encode shape is fixed), so any token
    # diff is a lane-recycling/placement bug, not numerics. A dedicated
    # B=1 whole-utterance re-encode is a DIFFERENT XLA program whose bf16
    # low bits differ across program boundaries; with random weights the
    # beams amplify those near-ties into token flips (measured: segmented
    # == dedicated at the same encode program, tests/test_{graves,alsd}_
    # segment.py pin it exactly in fp32). That cross-program noise shows up
    # as the static-vs-continuous diff count, reported separately — the
    # static executor re-buckets every request onto its own encode shape.
    idx = rng.choice(n_req, size=min(16, n_req), replace=False)
    bad_sched = [int(i) for i in idx
                 if cont_out[i][0] != cont.transcribe(wavs[i])[0]]
    cont.close()
    bucket_diff = sum(static_out[i][0] != cont_out[i][0] for i in idx)
    shape_diff = sum(static_out[i][0] != fixed_out[i][0] for i in idx)
    fixed_vs_cont = sum(fixed_out[i][0] != cont_out[i][0] for i in idx)
    print(f"parity: mixed-traffic vs solo replay through the same lane pool "
          f"on {len(idx)} sampled requests: "
          f"{'OK (scheduling exact)' if not bad_sched else f'MISMATCH at {bad_sched}'}",
          flush=True)
    print(f"        static-bucket vs continuous token diffs (cross-program "
          f"bf16 encode numerics, not scheduling): {bucket_diff}/{len(idx)}",
          flush=True)
    print(f"        static-bucket vs static-FIXED-shape diffs (same "
          f"executor+scheduling, only the padded program differs): "
          f"{shape_diff}/{len(idx)}", flush=True)
    print(f"        static-FIXED-shape vs continuous diffs (encode shape "
          f"matched; residual = fused-vs-split program compilation): "
          f"{fixed_vs_cont}/{len(idx)}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "continuous":
        main_continuous()
    else:
        main()
