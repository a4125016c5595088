"""Training driver: manifest pipeline, checkpoint/resume, loss descent."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.frontend.features import nemo_frontend_config
from reazonspeech_tpu.models.fastconformer import FastConformerConfig
from reazonspeech_tpu.models.rnnt import RNNTConfig
from reazonspeech_tpu.nemo.asr.model import default_ja_tokenizer, init_params
from reazonspeech_tpu.training.data import manifest_batches, read_manifest
from reazonspeech_tpu.training.trainer import Trainer, TrainerConfig
# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow


EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples", "evaluation")


@pytest.fixture(scope="module")
def manifest(tmp_path_factory):
    sys.path.insert(0, EXAMPLES)
    from local_fixture import build_fixture

    d = tmp_path_factory.mktemp("train_fixture")
    build_fixture(str(d), rows=8, seconds=0.5)
    return os.path.join(str(d), "metadata.jsonl")


def _cfgs():
    enc = FastConformerConfig.tiny(compute_dtype="float32")
    rnnt = RNNTConfig.tiny(enc_dim=enc.d_model, compute_dtype="float32")
    return nemo_frontend_config(), enc, rnnt


def test_manifest_batches_shapes(manifest):
    fe, enc, rnnt = _cfgs()
    tok = default_ja_tokenizer(rnnt.vocab_size)
    batches = list(manifest_batches(manifest, tok, batch_size=4, epochs=1))
    assert batches
    b = batches[0]
    assert b["waveform"].shape[0] == b["labels"].shape[0]
    assert b["waveform"].shape[1] % 16000 == 0
    assert (b["label_lengths"] > 0).all()
    assert (b["lengths"] <= b["waveform"].shape[1]).all()


def test_trainer_fit_save_resume(manifest, tmp_path):
    fe, enc, rnnt = _cfgs()
    tok = default_ja_tokenizer(rnnt.vocab_size)
    cfg = TrainerConfig(
        checkpoint_dir=str(tmp_path / "ckpt"),
        save_every=2,
        log_every=1,
        peak_lr=1e-3,
        warmup_steps=2,
        decay_steps=100,
    )

    tr = Trainer(fe, enc, rnnt, cfg)
    tr.init(init_params(0, enc, rnnt))
    hist = tr.fit(
        manifest_batches(manifest, tok, batch_size=4, epochs=4),
        max_steps=4,
        log_file=str(tmp_path / "log.jsonl"),
    )
    assert int(tr.state.step) == 4
    assert all(np.isfinite(h["loss"]) for h in hist)
    # checkpoints written at steps 2 and 4
    assert Trainer.list_checkpoints(cfg.checkpoint_dir) == [2, 4]
    # metrics logged
    assert os.path.getsize(tmp_path / "log.jsonl") > 0

    # resume: a FRESH trainer restores step/params/opt state and continues
    tr2 = Trainer(fe, enc, rnnt, cfg)
    tr2.restore_latest(init_params(1, enc, rnnt))
    assert int(tr2.state.step) == 4
    # restored params equal the saved ones, not the fresh template
    a = np.asarray(jax.tree.leaves(tr.state.params)[0])
    b = np.asarray(jax.tree.leaves(tr2.state.params)[0])
    np.testing.assert_array_equal(a, b)

    tr2.fit(manifest_batches(manifest, tok, batch_size=4, epochs=4), max_steps=6)
    assert int(tr2.state.step) == 6
    # retention keeps the newest N=3
    assert Trainer.list_checkpoints(cfg.checkpoint_dir)[-1] == 6


def test_trainer_restore_without_checkpoints_raises(tmp_path):
    fe, enc, rnnt = _cfgs()
    cfg = TrainerConfig(checkpoint_dir=str(tmp_path / "none"))
    tr = Trainer(fe, enc, rnnt, cfg)
    with pytest.raises(FileNotFoundError, match="step_"):
        tr.restore_latest(init_params(0, enc, rnnt))


def test_trainer_sharded_smoke(manifest):
    """Trainer over the emulated 8-device mesh (dp=4, tp=2)."""
    from reazonspeech_tpu.parallel.mesh import make_mesh

    fe, enc, rnnt = _cfgs()
    tok = default_ja_tokenizer(rnnt.vocab_size)
    mesh = make_mesh(n_data=4, n_model=2)
    tr = Trainer(fe, enc, rnnt, TrainerConfig(warmup_steps=2, decay_steps=10), mesh=mesh)
    tr.init(init_params(0, enc, rnnt))
    hist = tr.fit(manifest_batches(manifest, tok, batch_size=4, epochs=1), max_steps=1)
    assert int(tr.state.step) == 1
    assert np.isfinite(float(hist[0]["loss"])) if hist else True


def test_trainer_pipelined_smoke(manifest):
    """Trainer with the encoder under the GPipe schedule (dp=2 x pipe=2)."""
    from reazonspeech_tpu.parallel.pipeline import (
        PipelineSpec,
        make_pipeline_mesh,
    )
    from reazonspeech_tpu.parallel.sequence import use_mesh

    fe, enc, rnnt = _cfgs()
    tok = default_ja_tokenizer(rnnt.vocab_size)
    import jax

    mesh = make_pipeline_mesh(n_pipe=2, n_data=2, devices=jax.devices()[:4])
    spec = PipelineSpec(mesh=mesh, data_axis="data", n_micro=2)
    tr = Trainer(fe, enc, rnnt, TrainerConfig(warmup_steps=2, decay_steps=10),
                 pipeline=spec)
    tr.init(init_params(0, enc, rnnt))
    with use_mesh(mesh):
        hist = tr.fit(manifest_batches(manifest, tok, batch_size=4, epochs=1),
                      max_steps=1)
    assert int(tr.state.step) == 1
    assert hist and np.isfinite(float(hist[0]["loss"]))


def test_manifest_batches_tail_not_dropped(manifest):
    """A manifest smaller than batch_size still yields (refilled) batches,
    and tail rows are never silently discarded."""
    fe, enc, rnnt = _cfgs()
    tok = default_ja_tokenizer(rnnt.vocab_size)
    # 3 rows (< batch_size) with transcripts inside the tiny vocab
    src = read_manifest(manifest)[:3]
    rows = [
        {"audio": r["audio"], "transcription": text}
        for r, text in zip(src, ("あいう", "えおか", "きくけ"))
    ]
    batches = list(
        manifest_batches(rows, tok, batch_size=4, epochs=2, shuffle=False)
    )
    assert len(batches) == 2  # one (refilled) batch per epoch
    assert all(b["waveform"].shape[0] == 4 for b in batches)


def test_native_wav_batch_loader_matches_python(manifest):
    """The C++ thread-pool WAV loader must produce byte-identical samples to
    the Python decoder, and _load_wavs must route through it."""
    from reazonspeech_tpu import native
    from reazonspeech_tpu.core.audio import audio_from_path
    from reazonspeech_tpu.training.data import _load_wavs

    if not native.available():
        pytest.skip("native library unavailable")

    paths = [r["audio"] for r in read_manifest(manifest)[:4]]
    sr, n = native.wav_info(paths[0])
    assert sr == 16000 and n > 0

    stride = max(native.wav_info(p)[1] for p in paths)
    batch, lengths = native.wav_batch_load(paths, stride)
    assert (lengths > 0).all()
    for i, p in enumerate(paths):
        want = np.asarray(audio_from_path(p).waveform, np.float32)
        np.testing.assert_array_equal(batch[i, : lengths[i]], want)
        # zero padding beyond the valid length
        assert not batch[i, lengths[i]:].any()

    out = _load_wavs(paths)
    for arr, p in zip(out, paths):
        want = np.asarray(audio_from_path(p).waveform, np.float32)
        np.testing.assert_array_equal(arr, want)


def test_prefetch_wrapper(manifest):
    from reazonspeech_tpu.training.data import manifest_batches, prefetch

    fe, enc, rnnt = _cfgs()
    tok = default_ja_tokenizer(rnnt.vocab_size)
    direct = list(manifest_batches(manifest, tok, batch_size=4, epochs=2,
                                   shuffle=False))
    fetched = list(prefetch(
        manifest_batches(manifest, tok, batch_size=4, epochs=2, shuffle=False),
        depth=2,
    ))
    assert len(fetched) == len(direct)
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a["waveform"], b["waveform"])
        np.testing.assert_array_equal(a["labels"], b["labels"])


def test_prefetch_propagates_errors():
    from reazonspeech_tpu.training.data import prefetch

    def boom():
        yield {"ok": 1}
        raise RuntimeError("decode failed")

    it = prefetch(boom(), depth=1)
    assert next(it)["ok"] == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        list(it)
