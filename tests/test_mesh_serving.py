"""Mesh-sharded serving: per-request outputs identical to single-device.

parallel/serving.py shards the MicroBatcher's coalesced batch over the mesh
data axis via shard_map (pure data parallelism — each emulated device runs
the full frontend→encoder→decode pipeline on its local shard). Scaling
target being replaced: the reference's process-DP evaluation loop
(pkg/evaluation/src/base.py:194-215) — here ONE process spans the slice.
"""

import numpy as np
import pytest

from reazonspeech_tpu.parallel import DataParallelDecoder, make_mesh
from reazonspeech_tpu.serving import MicroBatcher


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_data=4, n_model=2)


@pytest.fixture(scope="module")
def tiny_nemo():
    from reazonspeech_tpu.decoding.rnnt_beam import BeamDecodeConfig
    from reazonspeech_tpu.models.fastconformer import FastConformerConfig
    from reazonspeech_tpu.models.rnnt import RNNTConfig
    from reazonspeech_tpu.nemo.asr.model import (
        NemoTPUModel,
        default_ja_tokenizer,
        init_params,
    )
    from reazonspeech_tpu.frontend.features import nemo_frontend_config

    enc_cfg = FastConformerConfig(
        num_layers=2, d_model=32, num_heads=4, ff_expansion=2,
        conv_kernel=9, subsampling_channels=32, compute_dtype="float32",
    )
    rnnt_cfg = RNNTConfig(
        vocab_size=64, enc_dim=32, pred_hidden=32, joint_hidden=32,
        compute_dtype="float32",
    )
    return NemoTPUModel(
        params=init_params(0, enc_cfg, rnnt_cfg),
        fe_cfg=nemo_frontend_config(),
        enc_cfg=enc_cfg,
        rnnt_cfg=rnnt_cfg,
        decode_cfg=BeamDecodeConfig(beam_size=2),
        tokenizer=default_ja_tokenizer(64),
    )


def _mixed_wavs(n, seed=0):
    rng = np.random.default_rng(seed)
    return [
        (rng.standard_normal(int(16000 * rng.choice((0.5, 1.2, 2.3, 3.1))))
         * 0.1).astype(np.float32)
        for _ in range(n)
    ]


def test_dp_decode_matches_single_device(tiny_nemo, mesh):
    """Sharded decode_batch == the container's own decode_batch, row for
    row, on a batch spanning all data shards."""
    dp = DataParallelDecoder(tiny_nemo, mesh)
    wavs = _mixed_wavs(8)
    padded = max(len(w) for w in wavs)
    padded = -(-padded // dp.bucket_samples) * dp.bucket_samples
    buf = np.zeros((8, padded), np.float32)
    lens = np.zeros(8, np.int32)
    for i, w in enumerate(wavs):
        buf[i, : len(w)] = w
        lens[i] = len(w)

    want = tiny_nemo.decode_batch(buf, lens)
    got = dp.decode_batch(buf, lens)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_dp_decode_single(tiny_nemo, mesh):
    dp = DataParallelDecoder(tiny_nemo, mesh)
    w = _mixed_wavs(1, seed=5)[0]
    assert dp.decode_single(w) == tiny_nemo.decode_single(w)


def test_dp_pads_indivisible_batch(tiny_nemo, mesh):
    """Batches that don't divide over the data axis are padded with empty
    rows and trimmed — row-for-row equal to the unsharded decode."""
    dp = DataParallelDecoder(tiny_nemo, mesh)
    wavs = _mixed_wavs(3, seed=13)
    padded = -(-max(len(w) for w in wavs) // dp.bucket_samples) \
        * dp.bucket_samples
    buf = np.zeros((3, padded), np.float32)
    lens = np.zeros(3, np.int32)
    for i, w in enumerate(wavs):
        buf[i, : len(w)] = w
        lens[i] = len(w)
    want = tiny_nemo.decode_batch(buf, lens)
    got = dp.decode_batch(buf, lens)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_transcribe_batch_over_mesh(tiny_nemo, mesh):
    """The public flavor API runs over the slice unchanged: attribute
    delegation makes DataParallelDecoder a drop-in container, so
    transcribe_batch (and the evaluation examples' --mesh-data path,
    evaluation/mesh.py) produce identical results to single-device."""
    from reazonspeech_tpu.core.audio import audio_from_numpy
    from reazonspeech_tpu.nemo.asr.transcribe import transcribe_batch

    dp = DataParallelDecoder(tiny_nemo, mesh)
    audios = [audio_from_numpy(w, 16000) for w in _mixed_wavs(5, seed=17)]
    want = transcribe_batch(tiny_nemo, audios)
    got = transcribe_batch(dp, audios)
    assert [r.text for r in got] == [r.text for r in want]
    assert [[s.seconds for s in r.subwords] for r in got] == \
        [[s.seconds for s in r.subwords] for r in want]


def test_microbatcher_over_mesh(tiny_nemo, mesh):
    """The serving executor drives the sharded decoder transparently:
    batch buckets are rounded to the data axis and per-request results
    match dedicated single-device decodes."""
    dp = DataParallelDecoder(tiny_nemo, mesh)
    batcher = MicroBatcher(dp, max_batch=8, max_wait_ms=40.0)
    try:
        wavs = _mixed_wavs(6, seed=9)
        futs = [batcher.submit(w) for w in wavs]
        got = [f.result(timeout=600) for f in futs]
    finally:
        batcher.close()
    for w, (tokens, frames) in zip(wavs, got):
        want_tokens, want_frames = tiny_nemo.decode_single(w)
        assert tokens == want_tokens
        assert frames == want_frames
    assert all(b % dp.n_data == 0 for b, _ in batcher.batch_shapes)


def test_microbatcher_validates_max_batch(tiny_nemo, mesh):
    dp = DataParallelDecoder(tiny_nemo, mesh)
    with pytest.raises(ValueError):
        MicroBatcher(dp, max_batch=6)
