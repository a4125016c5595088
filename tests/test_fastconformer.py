import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.models.fastconformer import (
    FastConformerConfig,
    _rel_shift,
    _sinusoid_rel_pos,
    fastconformer_encode,
    init_fastconformer,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = FastConformerConfig.tiny(compute_dtype="float32")
    params = init_fastconformer(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_rel_shift_matches_gather():
    """out[..., t, j] must pick the pos-score at relative offset t - j, where
    the table axis is ordered [T-1 ... -(T-1)] (index l ↔ offset T-1-l)."""
    b, h, t = 2, 3, 7
    x = jnp.asarray(np.random.default_rng(0).standard_normal((b, h, t, 2 * t - 1)))
    got = np.asarray(_rel_shift(x))
    xn = np.asarray(x)
    want = np.zeros((b, h, t, t))
    for ti in range(t):
        for j in range(t):
            want[:, :, ti, j] = xn[:, :, ti, (t - 1) - ti + j]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_sinusoid_table():
    pe = np.asarray(_sinusoid_rel_pos(5, 8))
    assert pe.shape == (9, 8)
    # center row is offset 0: sin(0)=0, cos(0)=1
    np.testing.assert_allclose(pe[4, 0::2], 0.0, atol=1e-7)
    np.testing.assert_allclose(pe[4, 1::2], 1.0, atol=1e-7)


def test_encode_shapes_and_lengths(tiny):
    cfg, params = tiny
    b, t = 2, 203
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, t, cfg.feat_in)), jnp.float32
    )
    lens = jnp.array([203, 117])
    enc, enc_lens = fastconformer_encode(params, feats, lens, cfg)
    # three stride-2 stages: L' = floor((L-1)/2)+1 applied 3x
    def sub(n):
        for _ in range(3):
            n = (n - 1) // 2 + 1
        return n

    assert enc.shape == (b, sub(t), cfg.d_model)
    assert [int(x) for x in enc_lens] == [sub(203), sub(117)]
    assert np.isfinite(np.asarray(enc)).all()
    # frames beyond the valid length are zeroed
    assert np.all(np.asarray(enc[1, sub(117) :]) == 0)


def test_encode_padding_invariance(tiny):
    """A short utterance must encode identically whether padded to T or 2T
    (masked attention + masked convs): the conv receptive field sees zeros
    either way."""
    cfg, params = tiny
    rng = np.random.default_rng(1)
    t_valid = 96
    feats = rng.standard_normal((1, t_valid, cfg.feat_in)).astype(np.float32)
    short = np.zeros((1, 128, cfg.feat_in), np.float32)
    short[0, :t_valid] = feats
    long = np.zeros((1, 256, cfg.feat_in), np.float32)
    long[0, :t_valid] = feats
    lens = jnp.array([t_valid])
    e1, l1 = fastconformer_encode(params, jnp.asarray(short), lens, cfg)
    e2, l2 = fastconformer_encode(params, jnp.asarray(long), lens, cfg)
    tv = int(l1[0])
    assert int(l2[0]) == tv
    np.testing.assert_allclose(
        np.asarray(e1[0, :tv]), np.asarray(e2[0, :tv]), atol=2e-4, rtol=1e-3
    )


def test_encode_batch_order_independence(tiny):
    """Each batch element's encoding must not depend on its neighbors."""
    cfg, params = tiny
    rng = np.random.default_rng(2)
    a = rng.standard_normal((1, 128, cfg.feat_in)).astype(np.float32)
    b = rng.standard_normal((1, 128, cfg.feat_in)).astype(np.float32)
    lens1 = jnp.array([128])
    ea, _ = fastconformer_encode(params, jnp.asarray(a), lens1, cfg)
    both = jnp.asarray(np.concatenate([b, a]))
    eboth, _ = fastconformer_encode(params, both, jnp.array([128, 128]), cfg)
    np.testing.assert_allclose(
        np.asarray(ea[0]), np.asarray(eboth[1]), atol=2e-4, rtol=1e-3
    )


def test_param_count_xlarge():
    """The flagship config must land in the reference's published ballpark:
    619M total (README.rst:35) ≈ encoder + decoder + joint."""
    cfg = FastConformerConfig.xlarge()
    # count without materializing: eval_shape
    shapes = jax.eval_shape(lambda k: init_fastconformer(k, cfg), jax.random.PRNGKey(0))
    n_enc = sum(np.prod(x.shape) for x in jax.tree.leaves(shapes))
    from reazonspeech_tpu.models.rnnt import RNNTConfig, init_joint, init_predictor

    rc = RNNTConfig()
    sp = jax.eval_shape(lambda k: init_predictor(k, rc), jax.random.PRNGKey(0))
    sj = jax.eval_shape(lambda k: init_joint(k, rc), jax.random.PRNGKey(0))
    n_dec = sum(np.prod(x.shape) for x in jax.tree.leaves(sp)) + sum(
        np.prod(x.shape) for x in jax.tree.leaves(sj)
    )
    total = (n_enc + n_dec) / 1e6
    assert 550 < total < 700, f"total params {total:.1f}M out of range"
