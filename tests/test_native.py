"""Native C++ library tests (built on demand via make)."""

import numpy as np
import pytest

from reazonspeech_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_edit_distance_matches_python():
    from reazonspeech_tpu.core.text import edit_distance

    cases = [
        ("", ""), ("a", ""), ("kitten", "sitting"),
        ("こんにちは世界", "こんばんは、世界"), ("𝔘ni", "uni"),
    ]
    for a, b in cases:
        got = native.edit_distance(a, b)
        # reference pure-python Wagner-Fischer
        n, m = len(a), len(b)
        prev = list(range(m + 1))
        for i in range(1, n + 1):
            cur = [i] + [0] * m
            for j in range(1, m + 1):
                cur[j] = (
                    prev[j - 1]
                    if a[i - 1] == b[j - 1]
                    else min(prev[j], cur[j - 1], prev[j - 1]) + 1
                )
            prev = cur
        assert got == prev[m]
        assert edit_distance(a, b) == prev[m]  # public path uses native


def test_pcm16():
    pcm = np.array([0, 16384, -32768, 32767], np.int16)
    out = native.pcm16_to_f32(pcm)
    np.testing.assert_allclose(out, [0.0, 0.5, -1.0, 32767 / 32768], atol=1e-7)


def test_downmix():
    x = np.array([[1.0, 3.0], [2.0, 4.0]], np.float32)
    np.testing.assert_allclose(native.downmix_mean(x), [2.0, 3.0])


def test_ts_scan(tmp_path):
    import sys

    sys.path.insert(0, "tests")
    from test_oneseg import build_stream

    stream = build_stream([(1.0, "あ".encode("euc-jp"))], caption_pid=0x130)
    offsets = native.ts_scan_pid(stream, 0x130, require_pusi=True)
    assert len(offsets) == 1
    pkt = stream[offsets[0] : offsets[0] + 188]
    assert pkt[0] == 0x47
    assert ((pkt[1] & 0x1F) << 8 | pkt[2]) == 0x130
    assert pkt[1] & 0x40  # PUSI
