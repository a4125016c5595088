"""Host-side units of the HTTP front (no model, fast tier)."""

from reazonspeech_tpu.serving.http import _prometheus_text


def test_prometheus_text_renders_healthz_shapes():
    stats = {
        "ok": True,
        "executor": "continuous",
        "requests_done": 7,
        "lane_occupancy": 0.42,
        "latency_s": {"p50": 0.01, "p95": 0.05, "p99": 0.09},
    }
    text = _prometheus_text(stats)
    lines = text.strip().splitlines()
    assert "reazonspeech_ok 1" in lines
    assert "reazonspeech_requests_done 7" in lines
    assert "reazonspeech_lane_occupancy 0.42" in lines
    assert 'reazonspeech_latency_s{quantile="0.50"} 0.01' in lines
    assert 'reazonspeech_latency_s{quantile="0.99"} 0.09' in lines
    assert 'reazonspeech_info{executor="continuous"} 1' in lines
    assert text.endswith("\n")


def test_prometheus_text_micro_stats():
    text = _prometheus_text(
        {"ok": True, "executor": "micro", "batches": 3, "mean_batch": 2.5})
    assert "reazonspeech_batches 3" in text
    assert "reazonspeech_mean_batch 2.5" in text
