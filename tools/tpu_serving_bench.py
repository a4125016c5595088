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

Usage: python tools/tpu_serving_bench.py [n_requests] [concurrency] [max_batch]
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


if __name__ == "__main__":
    main()
