"""AVSR micro-batching: batched beam generate == dedicated generates.

The AVSRBatcher coalesces (audio, video) requests into one jitted
beam-generate per tick (scales the reference's one-utterance HF generate,
pkg/avsr/src/avhubert/modeling_avhubert.py:330-391). Results must be
identical to a dedicated single-request generate: batching and time/batch
padding are invisible (padding rows are masked, padded frames sit past each
row's length mask).
"""

import numpy as np
import pytest

import jax

# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow

from reazonspeech_tpu.avsr.configuration_avhubert import AVHubertConfig
from reazonspeech_tpu.avsr.model import AVHubertForConditionalGeneration
from reazonspeech_tpu.serving import AVSRBatcher


@pytest.fixture(scope="module")
def tiny_model():
    cfg = AVHubertConfig.tiny(audio_feat_dim=104)
    return AVHubertForConditionalGeneration.init(jax.random.PRNGKey(0), cfg)


def _req(rng, t, audio=True, video=True):
    a = (rng.standard_normal((t, 104)).astype(np.float32) * 0.1
         if audio else None)
    v = (rng.standard_normal((t, 88, 88)).astype(np.float32) * 0.1
         if video else None)
    return a, v


def _dedicated(model, a, v, num_beams, max_length):
    t = len(a) if a is not None else len(v)
    cfg = model.config
    audio = np.zeros((1, t, cfg.audio_feat_dim), np.float32)
    video = np.zeros((1, t, 88, 88), np.float32)
    if a is not None:
        audio[0] = a
    if v is not None:
        video[0] = v
    toks = np.asarray(model.generate(
        audio=audio, video=video, lengths=np.array([t], np.int32),
        num_beams=num_beams, max_length=max_length))[0]
    hits = np.nonzero(toks == cfg.eos_token_id)[0]
    return toks[: int(hits[0]) if hits.size else len(toks)].tolist()


def test_batched_matches_dedicated(tiny_model):
    """Mixed lengths and modalities in one pool; per-request parity."""
    rng = np.random.default_rng(0)
    reqs = [
        _req(rng, 12),
        _req(rng, 30),
        _req(rng, 7, video=False),
        _req(rng, 21, audio=False),
        _req(rng, 30),
    ]
    batcher = AVSRBatcher(tiny_model, max_batch=8, max_wait_ms=200.0,
                          bucket_frames=16, num_beams=3, max_length=16)
    try:
        futs = [batcher.submit(a, v) for a, v in reqs]
        got = [f.result(timeout=600) for f in futs]
    finally:
        batcher.close()
    for (a, v), tokens in zip(reqs, got):
        assert tokens == _dedicated(tiny_model, a, v, 3, 16)
    # all requests coalesced into a bounded program set
    assert all(b in (1, 2, 4, 8) for b, _ in batcher.batch_shapes)
    assert all(t % 16 == 0 for _, t in batcher.batch_shapes)


def test_warmup_covers_bucket_set(tiny_model):
    """warmup() pre-compiles the exact (b_pad, t_pad) set _loop dispatches;
    traffic afterwards reuses those programs."""
    batcher = AVSRBatcher(tiny_model, max_batch=4, max_wait_ms=50.0,
                          bucket_frames=16, num_beams=3, max_length=16)
    try:
        warmed = batcher.warmup(seconds=16 / 25)  # one bucket_frames step
        assert warmed == [(1, 16), (2, 16), (4, 16)]
        rng = np.random.default_rng(3)
        a, v = _req(rng, 12)
        tokens = batcher.generate(a, v)
        assert tokens == _dedicated(tiny_model, a, v, 3, 16)
        assert batcher.batch_shapes[-1] in warmed  # no new program shape
    finally:
        batcher.close()


def test_greedy_mode_and_errors(tiny_model):
    batcher = AVSRBatcher(tiny_model, max_batch=4, num_beams=1,
                          bucket_frames=16, max_length=12)
    try:
        rng = np.random.default_rng(3)
        a, v = _req(rng, 10)
        assert batcher.generate(a, v) == _dedicated(tiny_model, a, v, 1, 12)
        with pytest.raises(ValueError):
            batcher.submit(None, None).result(timeout=10)
        with pytest.raises(ValueError):
            batcher.submit(a[:5], v).result(timeout=10)
    finally:
        batcher.close()


def test_avsr_http_route(tiny_model):
    """--flavor avsr HTTP route: WAV body (audio-only, server-side feature
    extraction) and npz body (pre-extracted audio+video) both round-trip
    through the AVSR micro-batcher."""
    import http.client
    import io
    import json
    import threading
    import wave
    from http.server import ThreadingHTTPServer

    from reazonspeech_tpu.serving.http import make_avsr_app

    handler, batcher = make_avsr_app(
        tiny_model, max_batch=4, max_wait_ms=5.0, bucket_frames=16,
        num_beams=3, max_length=12)
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)

        # WAV body -> audio-only AVSR
        rng = np.random.default_rng(0)
        wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((wav * 32767).astype(np.int16).tobytes())
        conn.request("POST", "/transcribe", body=buf.getvalue(),
                     headers={"Content-Type": "audio/wav"})
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 200, body
        payload = json.loads(body)
        assert isinstance(payload["token_ids"], list)

        # npz body -> pre-extracted audio + video, parity vs dedicated
        a, v = _req(rng, 10)
        nbuf = io.BytesIO()
        np.savez(nbuf, audio=a, video=v)
        conn.request("POST", "/transcribe", body=nbuf.getvalue(),
                     headers={"Content-Type": "application/x-npz"})
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 200, body
        payload = json.loads(body)
        assert payload["token_ids"] == _dedicated(tiny_model, a, v, 3, 12)

        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["ok"] and health["flavor"] == "avsr"
    finally:
        server.shutdown()
        batcher.close()
