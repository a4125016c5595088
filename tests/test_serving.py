"""Serving layer: micro-batching correctness + the HTTP front end-to-end."""

import http.client
import io
import threading
import wave

import numpy as np
import pytest

from reazonspeech_tpu.models.fastconformer import FastConformerConfig
from reazonspeech_tpu.models.rnnt import RNNTConfig
from reazonspeech_tpu.nemo.asr.model import load_model
from reazonspeech_tpu.serving import MicroBatcher
from reazonspeech_tpu.serving.http import make_app
# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def tiny_model():
    enc = FastConformerConfig.tiny(compute_dtype="float32")
    rnnt = RNNTConfig.tiny(enc_dim=enc.d_model, compute_dtype="float32")
    return load_model(checkpoint="random", enc_cfg=enc, rnnt_cfg=rnnt)


def _wavs(n, seconds=0.6):
    rng = np.random.default_rng(0)
    return [
        (rng.standard_normal(int(16000 * seconds)) * 0.1).astype(np.float32)
        for _ in range(n)
    ]


def test_microbatcher_matches_single_decode(tiny_model):
    """Batched execution must return exactly what decode_single returns for
    each request, regardless of batch composition."""
    batcher = MicroBatcher(tiny_model, max_batch=8, max_wait_ms=200.0)
    try:
        wavs = _wavs(5)
        futs = [batcher.submit(w) for w in wavs]
        got = [f.result(timeout=300) for f in futs]
        for w, (tokens, frames) in zip(wavs, got):
            want_tokens, want_frames = tiny_model.decode_single(w)
            assert tokens == want_tokens
            assert frames == want_frames
        # the 5 concurrent submissions coalesced (fewer calls than requests)
        assert sum(batcher.batch_sizes) == 5
        assert len(batcher.batch_sizes) < 5
    finally:
        batcher.close()


def test_microbatcher_serial_requests(tiny_model):
    batcher = MicroBatcher(tiny_model, max_batch=4, max_wait_ms=1.0)
    try:
        for w in _wavs(3):
            tokens, frames = batcher.transcribe(w)
            want_tokens, _ = tiny_model.decode_single(w)
            assert tokens == want_tokens
    finally:
        batcher.close()


def _wav_bytes(wav):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((wav * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def test_http_server_end_to_end(tiny_model):
    handler, batcher = make_app(tiny_model, max_batch=4, max_wait_ms=5.0)
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/transcribe", body=_wav_bytes(_wavs(1)[0]),
                     headers={"Content-Type": "audio/wav"})
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        import json

        payload = json.loads(resp.read())
        assert "text" in payload and "subwords" in payload

        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        health = json.loads(resp.read())
        assert health["ok"] and health["batches"] >= 1

        conn.request("GET", "/metrics")
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type").startswith("text/plain")
        metrics = resp.read().decode()
        assert "reazonspeech_ok 1" in metrics
        assert "reazonspeech_batches" in metrics

        # malformed WAV body -> clean JSON 500, server keeps serving
        conn.request("POST", "/transcribe", body=b"not a wav at all",
                     headers={"Content-Type": "audio/wav"})
        resp = conn.getresponse()
        assert resp.status == 500
        assert "error" in json.loads(resp.read())

        # unknown path -> 404
        conn.request("GET", "/nope")
        resp = conn.getresponse()
        assert resp.status == 404
        resp.read()

        # and the server still answers real work after both errors
        conn.request("POST", "/transcribe", body=_wav_bytes(_wavs(1)[0]),
                     headers={"Content-Type": "audio/wav"})
        resp = conn.getresponse()
        assert resp.status == 200
        resp.read()
    finally:
        server.shutdown()
        batcher.close()


def test_microbatcher_all_flavors():
    """Every flavor container satisfies the serving interface."""
    from reazonspeech_tpu.espnet.asr.model import (
        load_model_container as load_espnet,
    )
    from reazonspeech_tpu.k2.asr.model import load_model_container as load_k2
    from reazonspeech_tpu.models.conformer import espnet_encoder_config
    from reazonspeech_tpu.models.zipformer import ZipformerConfig

    models = [
        load_espnet(
            checkpoint="random",
            enc_cfg=espnet_encoder_config(
                num_layers=2, d_model=32, num_heads=4, subsampling_channels=32,
                compute_dtype="float32",
            ),
        ),
        load_k2(checkpoint="random",
                enc_cfg=ZipformerConfig.tiny(compute_dtype="float32")),
    ]
    wav = _wavs(1)[0]
    for model in models:
        batcher = MicroBatcher(model, max_batch=2, max_wait_ms=1.0)
        try:
            tokens, frames = batcher.transcribe(wav)
            want_tokens, _ = model.decode_single(wav)
            assert tokens == want_tokens
        finally:
            batcher.close()


def test_sigterm_drains_in_flight_requests():
    """SIGTERM mid-request stops accepting but completes queued work and
    exits 0 (serve() installs a shutdown handler; both batchers drain
    their queues on close)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    here = os.path.dirname(__file__)
    port = 18271
    # the child must import the package regardless of install state —
    # prepend the repo root (this suite itself runs from a source tree)
    env = dict(os.environ)
    root = os.path.dirname(here)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(here, "_tiny_server.py"), str(port),
         "1000"],  # 1 s batching window keeps the request queued at SIGTERM
        env=env)
    try:
        deadline = time.time() + 300
        while time.time() < deadline:  # wait for bind + model build
            try:
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=5)
                conn.request("GET", "/healthz")
                conn.getresponse().read()
                break
            except OSError:
                time.sleep(1.0)
        else:
            raise AssertionError("server never came up")

        result = {}

        def post():
            body = _wav_bytes(_wavs(1)[0])
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            c.request("POST", "/transcribe", body,
                      {"Content-Type": "audio/wav"})
            r = c.getresponse()
            result["status"] = r.status
            result["body"] = r.read()

        t = threading.Thread(target=post)
        t.start()
        time.sleep(0.3)  # request is queued inside the 1 s batching window
        proc.send_signal(signal.SIGTERM)
        t.join(timeout=300)
        assert result.get("status") == 200, result
        assert proc.wait(timeout=300) == 0
    finally:
        if proc.poll() is None:
            proc.kill()


def test_microbatcher_warmup_precompiles_bucket_set(tiny_model):
    """warmup() dispatches exactly the bucket-signature set _loop can
    produce; traffic after warmup never hits a new program shape."""
    calls = []

    class Rec:
        def __getattr__(self, k):
            return getattr(tiny_model, k)

        def decode_batch(self, buf, lens):
            calls.append(buf.shape)
            return tiny_model.decode_batch(buf, lens)

    mb = MicroBatcher(Rec(), max_batch=4, max_wait_ms=5.0)
    try:
        warmed = mb.warmup(0.6)
        assert [b for b, _ in warmed] == [1, 2, 4]
        assert set(calls) == set(warmed)
        for w in _wavs(3):
            mb.transcribe(w)
        assert set(calls) == set(warmed)  # no new shapes -> no new compiles
    finally:
        mb.close()


def test_microbatcher_batch_dim_bucketing(tiny_model):
    """Dispatched batch shapes are power-of-two bucketed so the compiled
    program set stays bounded under organic (variable-concurrency) load."""
    from reazonspeech_tpu.serving.batcher import MicroBatcher

    mb = MicroBatcher(tiny_model, max_batch=8, max_wait_ms=40.0)
    try:
        rng = np.random.default_rng(5)
        futs = [mb.submit(rng.standard_normal(16000).astype(np.float32) * 0.1)
                for _ in range(3)]
        for f in futs:
            f.result(timeout=120)
        mb.transcribe(rng.standard_normal(16000).astype(np.float32) * 0.1)
    finally:
        mb.close()
    assert mb.batch_shapes, "no batches dispatched"
    for b_pad, _ in mb.batch_shapes:
        assert b_pad & (b_pad - 1) == 0, mb.batch_shapes


def test_microbatcher_fixed_shape(tiny_model):
    """fixed_shape mode: every tick dispatches exactly the configured
    (batch, samples) program; fp32 results match decode_single; oversize
    requests are rejected at submit (the A/B shape-experiment contract)."""
    mb = MicroBatcher(tiny_model, max_wait_ms=40.0,
                      fixed_shape=(4, 16000))
    try:
        wavs = _wavs(3, seconds=0.6)
        futs = [mb.submit(w) for w in wavs]
        got = [f.result(timeout=300) for f in futs]
        for w, (tokens, frames) in zip(wavs, got):
            want_tokens, want_frames = tiny_model.decode_single(w)
            assert tokens == want_tokens
            assert frames == want_frames
        assert mb.batch_shapes and all(
            s == (4, 16000) for s in mb.batch_shapes), mb.batch_shapes
        too_long = np.zeros(16001, np.float32)
        with pytest.raises(ValueError, match="fixed dispatch shape"):
            mb.submit(too_long).result(timeout=10)
    finally:
        mb.close()


def test_serve_cli_decoding_override(monkeypatch):
    """--decoding reaches every flavor loader (the mAES/greedy serving
    opt-ins are deployable from the CLI), and the avsr flavor rejects it."""
    from reazonspeech_tpu.serving import http as shttp

    seen = {}

    def fake_nemo_load(checkpoint=None, decoding=None, **kw):
        seen["nemo"] = decoding
        return object()

    def fake_espnet_load(checkpoint=None, **kw):
        seen.setdefault("espnet", []).append(kw.get("decoding", "<default>"))
        return object()

    def fake_k2_load(checkpoint=None, decoding=None, **kw):
        seen["k2"] = decoding
        return object()

    monkeypatch.setattr("reazonspeech_tpu.nemo.asr.model.load_model",
                        fake_nemo_load)
    monkeypatch.setattr(
        "reazonspeech_tpu.espnet.asr.model.load_model_container",
        fake_espnet_load)
    monkeypatch.setattr("reazonspeech_tpu.k2.asr.huggingface.load_model",
                        fake_k2_load)

    shttp._load_flavor("nemo", decoding="greedy")
    shttp._load_flavor("espnet", decoding="maes")
    shttp._load_flavor("espnet")
    shttp._load_flavor("k2", decoding="beam")
    assert seen == {"nemo": "greedy", "espnet": ["maes", "<default>"],
                    "k2": "beam"}
    with pytest.raises(ValueError, match="avsr"):
        shttp._load_flavor("avsr", decoding="beam")

    # the argparse surface: --decoding lands in _load_flavor's third arg
    captured = {}

    def fake_load_flavor(flavor, checkpoint=None, decoding=None):
        captured["args"] = (flavor, checkpoint, decoding)
        raise SystemExit(0)  # stop main() before it builds a server

    monkeypatch.setattr(shttp, "_load_flavor", fake_load_flavor)
    with pytest.raises(SystemExit):
        shttp.main(["--flavor", "espnet", "--decoding", "maes"])
    assert captured["args"] == ("espnet", None, "maes")
