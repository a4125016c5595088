"""Streaming FastConformer tests: scan/step equivalence and causality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.models.fastconformer import FastConformerConfig, init_fastconformer
from reazonspeech_tpu.models.fastconformer_streaming import (
    StreamingConfig,
    streaming_encode,
    streaming_init_state,
    streaming_step,
)

# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    cfg = FastConformerConfig.tiny(compute_dtype="float32")
    params = init_fastconformer(jax.random.PRNGKey(0), cfg)
    scfg = StreamingConfig(chunk_frames=4, left_context=8, sub_context=16)
    return cfg, scfg, params


def mel(b, t, f, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((b, t, f)), jnp.float32
    )


def test_scan_matches_stepping(setup):
    cfg, scfg, params = setup
    b, n_chunks = 2, 4
    mpc = 8 * scfg.chunk_frames
    feats = mel(b, n_chunks * mpc, cfg.feat_in)

    scanned = streaming_encode(params, feats, cfg, scfg)

    state = streaming_init_state(cfg, scfg, b)
    outs = []
    for i in range(n_chunks):
        out, state = streaming_step(
            params, state, feats[:, i * mpc : (i + 1) * mpc], cfg, scfg
        )
        outs.append(out)
    stepped = jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(
        np.asarray(scanned), np.asarray(stepped), atol=1e-5, rtol=1e-5
    )


def test_causality(setup):
    """Changing future audio must not change already-emitted outputs."""
    cfg, scfg, params = setup
    b, n_chunks = 1, 4
    mpc = 8 * scfg.chunk_frames
    f1 = np.asarray(mel(b, n_chunks * mpc, cfg.feat_in, seed=1))
    f2 = f1.copy()
    f2[:, -mpc:] += 5.0  # perturb only the last chunk

    o1 = np.asarray(streaming_encode(params, jnp.asarray(f1), cfg, scfg))
    o2 = np.asarray(streaming_encode(params, jnp.asarray(f2), cfg, scfg))
    c = scfg.chunk_frames
    # all chunks before the perturbed one are identical
    np.testing.assert_allclose(o1[:, : (n_chunks - 1) * c], o2[:, : (n_chunks - 1) * c], atol=1e-6)
    # and the perturbed chunk does change
    assert not np.allclose(o1[:, -c:], o2[:, -c:], atol=1e-3)


def test_left_context_is_used(setup):
    """Earlier chunks within the left-context window must influence later
    outputs (i.e., caches actually carry information)."""
    cfg, scfg, params = setup
    b = 1
    mpc = 8 * scfg.chunk_frames
    f1 = np.asarray(mel(b, 2 * mpc, cfg.feat_in, seed=2))
    f2 = f1.copy()
    f2[:, :mpc] += 5.0  # perturb only the FIRST chunk

    o1 = np.asarray(streaming_encode(params, jnp.asarray(f1), cfg, scfg))
    o2 = np.asarray(streaming_encode(params, jnp.asarray(f2), cfg, scfg))
    c = scfg.chunk_frames
    assert not np.allclose(o1[:, c:], o2[:, c:], atol=1e-3)


def test_output_shapes(setup):
    cfg, scfg, params = setup
    mpc = 8 * scfg.chunk_frames
    feats = mel(1, 3 * mpc + 17, cfg.feat_in)  # trailing partial chunk dropped
    out = streaming_encode(params, feats, cfg, scfg)
    assert out.shape == (1, 3 * scfg.chunk_frames, cfg.d_model)
    assert np.isfinite(np.asarray(out)).all()
