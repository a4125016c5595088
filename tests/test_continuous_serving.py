"""Continuous-batching executor: lane recycling must be invisible to results.

Every request through the ContinuousBatcher must decode to exactly what a
dedicated whole-utterance decode of the same waveform produces (under the
shared emission cap) — continuous batching is a pure scheduling change over
the segmented Graves beam. Scales the reference's per-utterance serial loop
(pkg/espnet-asr/src/transcribe.py:59-78)."""

from dataclasses import replace

import numpy as np
import pytest

import jax.numpy as jnp

from reazonspeech_tpu.espnet.asr.model import (
    EspnetTPUModel,
    load_model_container,
)
from reazonspeech_tpu.models.conformer import espnet_encoder_config
from reazonspeech_tpu.serving import ContinuousBatcher
# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def tiny_espnet():
    return load_model_container(
        checkpoint="random",
        enc_cfg=espnet_encoder_config(
            num_layers=2, d_model=32, num_heads=4, subsampling_channels=32,
            compute_dtype="float32",
        ),
        decoding="beam",
        beam_size=4,
    )


def _mixed_wavs(n, seed=0, seconds=(0.4, 0.9, 1.3, 2.1)):
    rng = np.random.default_rng(seed)
    return [
        (rng.standard_normal(int(16000 * rng.choice(seconds))) * 0.1)
        .astype(np.float32)
        for _ in range(n)
    ]


def _dedicated(model: EspnetTPUModel, batcher: ContinuousBatcher, wav):
    """decode_single under the executor's shared emission cap."""
    capped = EspnetTPUModel(
        params=model.params, fe_cfg=model.fe_cfg, enc_cfg=model.enc_cfg,
        rnnt_cfg=model.rnnt_cfg,
        decode_cfg=replace(model.decode_cfg, max_tokens=batcher.cfg.max_tokens),
        tokenizer=model.tokenizer,
    )
    return capped.decode_single(wav)


def test_results_match_dedicated_decode(tiny_espnet):
    """Mixed-length traffic over a small lane pool: token + frame parity."""
    batcher = ContinuousBatcher(
        tiny_espnet, n_lanes=3, frames_per_segment=4, max_seconds=4.0)
    try:
        wavs = _mixed_wavs(8)
        futs = [batcher.submit(w) for w in wavs]
        got = [f.result(timeout=600) for f in futs]
    finally:
        batcher.close()
    for i, (w, (tokens, frames)) in enumerate(zip(wavs, got)):
        want_tokens, want_frames = _dedicated(tiny_espnet, batcher, w)
        assert tokens == want_tokens, i
        assert frames == want_frames, i
    # 8 requests over 3 lanes: recycling had to happen
    assert batcher.segments > 0
    assert batcher.encode_ticks >= 3


def test_warmup_compiles_pool_then_serves_correctly(tiny_espnet):
    """warmup() pushes a silent request through a lane (compiling the pool's
    program set); traffic afterwards still matches dedicated decodes."""
    batcher = ContinuousBatcher(
        tiny_espnet, n_lanes=3, frames_per_segment=4, max_seconds=4.0)
    try:
        warmed = batcher.warmup(seconds=0.5)  # scalar form (serve --warmup)
        assert warmed == [(1, 8000)]
        assert batcher.stats()["requests_done"] >= 1
        wavs = _mixed_wavs(4, seed=7)
        got = [f.result(timeout=600)
               for f in [batcher.submit(w) for w in wavs]]
    finally:
        batcher.close()
    for i, (w, (tokens, frames)) in enumerate(zip(wavs, got)):
        want_tokens, want_frames = _dedicated(tiny_espnet, batcher, w)
        assert tokens == want_tokens, i
        assert frames == want_frames, i


def test_lane_pool_saturation_and_reuse(tiny_espnet):
    """More concurrent requests than lanes; all resolve, all correct."""
    batcher = ContinuousBatcher(
        tiny_espnet, n_lanes=2, frames_per_segment=8, max_seconds=4.0)
    try:
        wavs = _mixed_wavs(5, seed=3)
        got = [None] * len(wavs)
        futs = [batcher.submit(w) for w in wavs]
        for i, f in enumerate(futs):
            got[i] = f.result(timeout=600)
    finally:
        batcher.close()
    for w, (tokens, _) in zip(wavs, got):
        want_tokens, _ = _dedicated(tiny_espnet, batcher, w)
        assert tokens == want_tokens


def test_serial_requests(tiny_espnet):
    batcher = ContinuousBatcher(
        tiny_espnet, n_lanes=2, frames_per_segment=16, max_seconds=4.0)
    try:
        for w in _mixed_wavs(3, seed=5):
            tokens, _ = batcher.transcribe(w)
            want_tokens, _ = _dedicated(tiny_espnet, batcher, w)
            assert tokens == want_tokens
    finally:
        batcher.close()


def test_rejects_overlong_utterance(tiny_espnet):
    batcher = ContinuousBatcher(
        tiny_espnet, n_lanes=2, frames_per_segment=8, max_seconds=1.0)
    try:
        fut = batcher.submit(np.zeros(16000 * 3, np.float32))
        with pytest.raises(ValueError):
            fut.result(timeout=60)
    finally:
        batcher.close()


def test_greedy_flavor_through_executor():
    """espnet ``decoding='greedy'`` rides the same lane pool (round-4
    greedy adapter): token + frame parity vs a dedicated decode under the
    executor's shared emission cap."""
    greedy = load_model_container(
        checkpoint="random",
        enc_cfg=espnet_encoder_config(
            num_layers=2, d_model=32, num_heads=4, subsampling_channels=32,
            compute_dtype="float32",
        ),
        decoding="greedy",
    )
    batcher = ContinuousBatcher(
        greedy, n_lanes=2, frames_per_segment=8, max_seconds=4.0)
    try:
        wavs = _mixed_wavs(5, seed=9)
        futs = [batcher.submit(w) for w in wavs]
        got = [f.result(timeout=600) for f in futs]
    finally:
        batcher.close()
    for i, (w, (tokens, frames)) in enumerate(zip(wavs, got)):
        want_tokens, want_frames = _dedicated(greedy, batcher, w)
        assert tokens == want_tokens, i
        assert frames == want_frames, i


def test_k2_zipformer_through_executor():
    """k2's pinned greedy_search (pkg/k2-asr/src/huggingface.py:73-83)
    through the executor: exercises the Zipformer2 encode-tick dispatch and
    the zipformer_output_length host lane clock."""
    from reazonspeech_tpu.k2.asr.model import (
        load_model_container as load_k2,
    )
    from reazonspeech_tpu.models.zipformer import ZipformerConfig

    model = load_k2(
        checkpoint="random",
        enc_cfg=ZipformerConfig.tiny(compute_dtype="float32"),
    )
    batcher = ContinuousBatcher(
        model, n_lanes=2, frames_per_segment=8, max_seconds=4.0)
    try:
        wavs = _mixed_wavs(4, seed=13)
        futs = [batcher.submit(w) for w in wavs]
        got = [f.result(timeout=600) for f in futs]
    finally:
        batcher.close()
    for i, (w, (tokens, frames)) in enumerate(zip(wavs, got)):
        capped = replace(model,
                         decode_cfg=replace(model.decode_cfg,
                                            max_tokens=batcher.cfg.max_tokens))
        want_tokens, want_frames = capped.decode_single(w)
        assert tokens == want_tokens, i
        assert frames == want_frames, i


# --- long audio through the lane pool (submit_long) -------------------------


def test_submit_long_short_delegates(tiny_espnet):
    """Audio that fits one window goes through submit() unchanged."""
    batcher = ContinuousBatcher(
        tiny_espnet, n_lanes=2, frames_per_segment=8, max_seconds=4.0)
    try:
        w = _mixed_wavs(1, seed=17, seconds=(1.1,))[0]
        got = batcher.submit_long(w).result(timeout=600)
        want = batcher.submit(w).result(timeout=600)
    finally:
        batcher.close()
    assert got == want


def test_submit_long_merges_windows(tiny_nemo):
    """A 10 s request over a 4 s window pool resolves to the center-keep
    merge of solo window replays through the same pool (scheduling-exact),
    frames rebased to the global encoder grid."""
    batcher = ContinuousBatcher(
        tiny_nemo, n_lanes=3, frames_per_segment=8, max_seconds=4.0)
    try:
        rng = np.random.default_rng(23)
        w = (rng.standard_normal(16000 * 10) * 0.1).astype(np.float32)
        got_tokens, got_frames = batcher.submit_long(
            w, overlap_seconds=1.0).result(timeout=600)

        sr = 16000
        chunk = batcher.max_samples
        overlap = int(1.0 * sr)
        hop = chunk - overlap
        starts = list(range(0, max(len(w) - overlap, 1), hop))
        assert len(starts) > 1  # the request really was windowed
        spf = batcher.seconds_per_frame()
        half = overlap / 2 / sr
        want_tokens, want_frames = [], []
        for i, s in enumerate(starts):
            toks, frs = batcher.transcribe(w[s:s + chunk])
            chunk_sec = min(chunk, len(w) - s) / sr
            lo = 0.0 if i == 0 else half
            hi = chunk_sec if i == len(starts) - 1 else chunk_sec - half
            for tok, fr in zip(toks, frs):
                t = fr * spf
                if lo <= t < hi:
                    want_tokens.append(tok)
                    want_frames.append(int(round((t + s / sr) / spf)))
    finally:
        batcher.close()
    assert got_tokens == want_tokens
    assert got_frames == want_frames
    assert got_frames == sorted(got_frames)  # one global monotone grid


def test_submit_long_interleaves_with_traffic(tiny_espnet):
    """A windowed long request shares the pool with ordinary traffic; the
    short requests still match their dedicated decodes and the long result
    is replay-stable through the same pool."""
    batcher = ContinuousBatcher(
        tiny_espnet, n_lanes=2, frames_per_segment=8, max_seconds=4.0)
    try:
        shorts = _mixed_wavs(3, seed=19)
        rng = np.random.default_rng(29)
        long_w = (rng.standard_normal(16000 * 9) * 0.1).astype(np.float32)
        long_fut = batcher.submit_long(long_w, overlap_seconds=1.0)
        short_futs = [batcher.submit(w) for w in shorts]
        long_got = long_fut.result(timeout=600)
        short_got = [f.result(timeout=600) for f in short_futs]
        long_replay = batcher.submit_long(
            long_w, overlap_seconds=1.0).result(timeout=600)
    finally:
        batcher.close()
    for w, (tokens, frames) in zip(shorts, short_got):
        want_tokens, want_frames = _dedicated(tiny_espnet, batcher, w)
        assert tokens == want_tokens
        assert frames == want_frames
    assert long_got == long_replay


def test_stream_matches_submit_long(tiny_nemo):
    """Incremental yields, concatenated, must equal submit_long exactly
    (stream is a pure delivery-order change over the same window plan)."""
    batcher = ContinuousBatcher(
        tiny_nemo, n_lanes=3, frames_per_segment=8, max_seconds=4.0)
    try:
        rng = np.random.default_rng(31)
        w = (rng.standard_normal(16000 * 10) * 0.1).astype(np.float32)
        want = batcher.submit_long(w, overlap_seconds=1.0).result(timeout=600)
        got_tokens, got_frames, n_yields = [], [], 0
        for tokens, frames in batcher.stream(w, overlap_seconds=1.0):
            got_tokens += tokens
            got_frames += frames
            n_yields += 1
    finally:
        batcher.close()
    assert (got_tokens, got_frames) == want
    assert n_yields > 1  # really incremental


def test_stream_short_audio_single_yield(tiny_espnet):
    batcher = ContinuousBatcher(
        tiny_espnet, n_lanes=2, frames_per_segment=8, max_seconds=4.0)
    try:
        w = _mixed_wavs(1, seed=37, seconds=(1.3,))[0]
        chunks = list(batcher.stream(w))
        want = batcher.transcribe(w)
    finally:
        batcher.close()
    assert chunks == [want]


def test_max_pending_sheds_load(tiny_espnet):
    """Backpressure: beyond max_pending queued requests submit raises
    queue.Full synchronously; every accepted request still resolves to the
    dedicated decode (shedding never corrupts the pool)."""
    import queue as _queue

    batcher = ContinuousBatcher(
        tiny_espnet, n_lanes=1, frames_per_segment=8, max_seconds=2.0,
        max_pending=2)
    try:
        wavs = _mixed_wavs(12, seed=41, seconds=(1.9,))
        accepted, shed = [], 0
        for w in wavs:
            try:
                accepted.append((w, batcher.submit(w)))
            except _queue.Full:
                shed += 1
        results = [(w, f.result(timeout=600)) for w, f in accepted]
    finally:
        batcher.close()
    assert shed > 0  # 12 rapid submits over 1 lane with a 2-deep queue
    assert accepted  # and not everything was shed
    for w, (tokens, frames) in results:
        want_tokens, want_frames = _dedicated(tiny_espnet, batcher, w)
        assert tokens == want_tokens
        assert frames == want_frames


def test_stats_snapshot(tiny_espnet):
    """stats() reports counters, occupancy in (0,1], and latency
    percentiles after traffic."""
    batcher = ContinuousBatcher(
        tiny_espnet, n_lanes=2, frames_per_segment=8, max_seconds=2.0)
    try:
        for w in _mixed_wavs(3, seed=43, seconds=(0.8, 1.6)):
            batcher.transcribe(w)
        s = batcher.stats()
    finally:
        batcher.close()
    assert s["requests_done"] == 3
    assert s["segments"] >= 1 and s["encode_ticks"] >= 1
    assert 0 < s["lane_occupancy"] <= 1
    assert s["latency_s"]["p50"] > 0
    assert s["latency_s"]["p99"] >= s["latency_s"]["p50"]
    assert s["queue_depth"] == 0 and s["lanes"] == 2


def test_fault_recovery_reinitializes_device_state(tiny_espnet):
    """A transient device fault mid-traffic (the round-3 ALSD kernel-fault
    class) must fail the in-flight requests AND leave the pool serving
    bit-correct results afterwards — the recovery path re-initializes the
    beam state and enc ring instead of resuming on poisoned buffers
    (degrade-don't-crash, pkg/espnet-asr/src/ctc.py:90-93)."""
    batcher = ContinuousBatcher(
        tiny_espnet, n_lanes=2, frames_per_segment=4, max_seconds=4.0)
    try:
        real = batcher._ad.segment_call
        calls = {"n": 0}

        def flaky(*a, **kw):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("injected device fault")
            return real(*a, **kw)

        batcher._ad.segment_call = flaky
        wavs = _mixed_wavs(4, seed=7)
        futs = [batcher.submit(w) for w in wavs]
        failed = 0
        for f in futs:
            try:
                f.result(timeout=600)
            except RuntimeError as e:
                assert "injected device fault" in str(e)
                failed += 1
        assert failed >= 1  # the fault fanned out to in-flight requests

        # the pool keeps serving, and serves CORRECT results
        for w in _mixed_wavs(3, seed=11):
            tokens, frames = batcher.submit(w).result(timeout=600)
            want_tokens, want_frames = _dedicated(tiny_espnet, batcher, w)
            assert tokens == want_tokens
            assert frames == want_frames
        assert calls["n"] > 2  # the executor loop survived the fault
    finally:
        batcher.close()


def test_submit_long_rejects_bad_overlap(tiny_espnet):
    batcher = ContinuousBatcher(
        tiny_espnet, n_lanes=2, frames_per_segment=8, max_seconds=2.0)
    try:
        with pytest.raises(ValueError):
            batcher.submit_long(np.zeros(16000 * 5, np.float32),
                                overlap_seconds=2.0)
    finally:
        batcher.close()


def test_seconds_per_frame_grid(tiny_espnet, tiny_nemo):
    """The steady-state grid period must mirror the host frame clock."""
    for model in (tiny_espnet, tiny_nemo):
        batcher = ContinuousBatcher(
            model, n_lanes=2, frames_per_segment=8, max_seconds=4.0)
        try:
            spf = batcher.seconds_per_frame()
            d = batcher.host_frames(48 * 16000) - batcher.host_frames(
                16 * 16000)
            assert spf == pytest.approx(32.0 / d)
        finally:
            batcher.close()


def test_rejects_unknown_decode_cfg(tiny_espnet):
    broken = replace(tiny_espnet, decode_cfg=object())
    with pytest.raises(TypeError):
        ContinuousBatcher(broken)


# --- nemo ALSD flavor through the same executor -----------------------------


@pytest.fixture(scope="module")
def tiny_nemo():
    from reazonspeech_tpu.models.fastconformer import FastConformerConfig
    from reazonspeech_tpu.models.rnnt import RNNTConfig
    from reazonspeech_tpu.nemo.asr.model import load_model

    enc = FastConformerConfig.tiny(compute_dtype="float32")
    rnnt = RNNTConfig.tiny(enc_dim=enc.d_model, compute_dtype="float32")
    return load_model(checkpoint="random", enc_cfg=enc, rnnt_cfg=rnnt,
                      decoding="alsd", beam_size=4)


def _dedicated_nemo(model, batcher, wav):
    """Whole-utterance ALSD decode under the executor's shared emission cap
    (direct rnnt_beam_decode: decode_single defaults the cap to its own
    padded T + u_max, which differs from the pool's)."""
    import jax.numpy as jnp2

    from reazonspeech_tpu.decoding.rnnt_beam import rnnt_beam_decode
    from reazonspeech_tpu.frontend.features import log_mel_spectrogram
    from reazonspeech_tpu.models.fastconformer import fastconformer_encode

    buf = np.zeros((1, batcher.max_samples), np.float32)
    buf[0, : len(wav)] = wav
    feats, flens = log_mel_spectrogram(
        jnp2.asarray(buf), jnp2.asarray([len(wav)], np.int32), model.fe_cfg)
    enc, elens = fastconformer_encode(
        model.params["encoder"], feats, flens, model.enc_cfg)
    tokens, frames, counts, _ = rnnt_beam_decode(
        model.params["predictor"], model.params["joint"], enc, elens,
        model.rnnt_cfg, batcher.cfg)
    c = int(counts[0])
    return (np.asarray(tokens)[0, :c].tolist(),
            np.asarray(frames)[0, :c].tolist())


def test_alsd_results_match_dedicated_decode(tiny_nemo):
    """nemo ALSD flavor through the lane-recycling executor: token + frame
    parity vs a dedicated whole-utterance decode under the shared cap."""
    batcher = ContinuousBatcher(
        tiny_nemo, n_lanes=3, frames_per_segment=8, max_seconds=4.0)
    try:
        wavs = _mixed_wavs(8, seed=7)
        futs = [batcher.submit(w) for w in wavs]
        got = [f.result(timeout=600) for f in futs]
    finally:
        batcher.close()
    for i, (w, (tokens, frames)) in enumerate(zip(wavs, got)):
        want_tokens, want_frames = _dedicated_nemo(tiny_nemo, batcher, w)
        assert tokens == want_tokens, i
        assert frames == want_frames, i
    assert batcher.segments > 0
    assert batcher.encode_ticks >= 3


def test_mesh_matches_single_device(tiny_espnet, tiny_nemo):
    """Lane pool sharded over the emulated mesh data axis: per-request
    outputs must be identical to the single-device executor (both flavors).
    One process spans the slice — beyond the reference's process-DP
    (pkg/evaluation/src/base.py:194-215)."""
    import jax

    from reazonspeech_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    for model in (tiny_espnet, tiny_nemo):
        wavs = _mixed_wavs(6, seed=13)
        single = ContinuousBatcher(
            model, n_lanes=4, frames_per_segment=8, max_seconds=4.0)
        try:
            want = [f.result(timeout=600)
                    for f in [single.submit(w) for w in wavs]]
        finally:
            single.close()
        sharded = ContinuousBatcher(
            model, n_lanes=4, frames_per_segment=8, max_seconds=4.0,
            mesh=mesh)
        try:
            got = [f.result(timeout=600)
                   for f in [sharded.submit(w) for w in wavs]]
        finally:
            sharded.close()
        assert got == want, type(model).__name__


def test_mesh_rejects_indivisible_lanes(tiny_espnet):
    import jax

    from reazonspeech_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    with pytest.raises(ValueError):
        ContinuousBatcher(tiny_espnet, n_lanes=3, mesh=mesh)


def test_alsd_serial_requests(tiny_nemo):
    batcher = ContinuousBatcher(
        tiny_nemo, n_lanes=2, frames_per_segment=16, max_seconds=4.0)
    try:
        for w in _mixed_wavs(3, seed=9):
            tokens, _ = batcher.transcribe(w)
            want_tokens, _ = _dedicated_nemo(tiny_nemo, batcher, w)
            assert tokens == want_tokens
    finally:
        batcher.close()


def test_host_frame_clock_matches_device(tiny_espnet):
    """The host-side lane clock formula must equal the encoder's reported
    lengths for assorted sample counts (no readback = correctness hinges
    on this mirror)."""
    from reazonspeech_tpu.espnet.asr.model import encode_ctc

    batcher = ContinuousBatcher(
        tiny_espnet, n_lanes=2, frames_per_segment=8, max_seconds=4.0)
    try:
        for n in (1600, 6400, 16000, 16001, 31999, 48000):
            buf = np.zeros((1, 64000), np.float32)
            _, elens = encode_ctc(
                tiny_espnet.params, jnp.asarray(buf),
                jnp.asarray([n], np.int32),
                tiny_espnet.fe_cfg, tiny_espnet.enc_cfg)
            assert batcher.host_frames(n) == int(elens[0]), n
    finally:
        batcher.close()


def test_http_server_continuous_executor(tiny_nemo):
    """reazonspeech-serve --continuous: the HTTP front over the
    lane-recycling executor (same contract as the MicroBatcher app)."""
    import http.client
    import json
    import threading
    from http.server import ThreadingHTTPServer

    from reazonspeech_tpu.serving.http import make_app

    handler, batcher = make_app(
        tiny_nemo, executor="continuous", n_lanes=2, frames_per_segment=16,
        max_seconds=2.0)
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        wav = _mixed_wavs(1, seed=21, seconds=(0.7,))[0]
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/transcribe", body=wav.tobytes(),
                     headers={"Content-Type": "application/octet-stream"})
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        payload = json.loads(resp.read())
        assert "text" in payload and "subwords" in payload

        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["ok"] and health["executor"] == "continuous"
        assert health["segments"] >= 1
        assert health["requests_done"] >= 1
        assert health["latency_s"]["p50"] > 0
        assert 0 < health["lane_occupancy"] <= 1

        # long audio (> max_seconds) is windowed over the pool (submit_long)
        long_wav = _mixed_wavs(1, seed=23, seconds=(4.5,))[0]
        conn.request("POST", "/transcribe", body=long_wav.tobytes(),
                     headers={"Content-Type": "application/octet-stream"})
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        whole = json.loads(resp.read())
        assert "text" in whole and "subwords" in whole

        # /transcribe_stream: ndjson increments; concatenated subwords must
        # equal the whole-request result (same window plan + merge)
        conn.request("POST", "/transcribe_stream", body=long_wav.tobytes(),
                     headers={"Content-Type": "application/octet-stream"})
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "application/x-ndjson"
        lines = [json.loads(ln) for ln in resp.read().splitlines() if ln]
        assert len(lines) > 1  # 4.5 s over a 2 s window: multiple yields
        streamed = [sw for ln in lines for sw in ln["subwords"]]
        assert streamed == whole["subwords"]
    finally:
        server.shutdown()
        batcher.close()


def test_maes_flavor_through_executor():
    """espnet ``decoding='maes'`` (the alignment-synchronous opt-in) rides
    the same lane pool: mixed traffic == dedicated decode per request."""
    model = load_model_container(
        checkpoint="random",
        enc_cfg=espnet_encoder_config(
            num_layers=2, d_model=32, num_heads=4, subsampling_channels=32,
            compute_dtype="float32",
        ),
        decoding="maes",
        beam_size=4,
    )
    batcher = ContinuousBatcher(
        model, n_lanes=3, frames_per_segment=4, max_seconds=4.0)
    try:
        wavs = _mixed_wavs(6, seed=3)
        futs = [batcher.submit(w) for w in wavs]
        got = [f.result(timeout=600) for f in futs]
    finally:
        batcher.close()
    for i, (w, (tokens, frames)) in enumerate(zip(wavs, got)):
        want_tokens, want_frames = _dedicated(model, batcher, w)
        assert tokens == want_tokens, i
        assert frames == want_frames, i
    assert batcher.segments > 0
