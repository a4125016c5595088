import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.models.zipformer import (
    ZipformerConfig,
    _compact_rel_pos,
    bias_norm,
    bias_norm_init,
    bypass_apply,
    bypass_init,
    init_zipformer,
    swoosh_l,
    swoosh_r,
    zipformer_encode,
)

# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny():
    cfg = ZipformerConfig.tiny(compute_dtype="float32")
    params = init_zipformer(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_swoosh_values():
    # SwooshL(0) = log(1+e^-4) - 0.035 ≈ -0.0169; SwooshR(0) = log(1+e^-1)-0.313
    np.testing.assert_allclose(float(swoosh_l(jnp.array(0.0))), np.log1p(np.exp(-4)) - 0.035, atol=1e-6)
    np.testing.assert_allclose(float(swoosh_r(jnp.array(0.0))), np.log1p(np.exp(-1)) - 0.313, atol=1e-6)
    # approximately linear for large x: slope ~0.92
    x = jnp.array(20.0)
    np.testing.assert_allclose(float(swoosh_l(x + 1) - swoosh_l(x)), 0.92, atol=1e-3)


def test_bias_norm():
    p = bias_norm_init(8)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 8)), jnp.float32)
    y = bias_norm(p, x)
    # zero bias, zero log_scale: y = x / rms(x)
    rms = np.sqrt((np.asarray(x) ** 2).mean(-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) / rms, rtol=1e-5)


def test_bypass_clamps():
    p = {"scale": jnp.array([-1.0, 0.5, 2.0])}
    x0 = jnp.zeros((1, 1, 3))
    x1 = jnp.ones((1, 1, 3))
    out = np.asarray(bypass_apply(p, x0, x1))[0, 0]
    np.testing.assert_allclose(out, [0.0, 0.5, 1.0])


def test_compact_rel_pos():
    pe = _compact_rel_pos(5, 12)
    assert pe.shape == (9, 12)
    assert np.isfinite(pe).all()
    # symmetric distances give mirrored sin components
    np.testing.assert_allclose(pe[0, :6], -pe[8, :6], atol=1e-6)


def test_zipformer_encode_shapes(tiny):
    cfg, params = tiny
    b, t = 2, 206
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, t, cfg.feat_in)), jnp.float32
    )
    lens = jnp.array([t, 101])
    out, out_lens = zipformer_encode(params, feats, lens, cfg)
    t1 = (t - 5) // 2 - 1  # embed time reduction
    t_out = -(-t1 // cfg.output_downsampling)
    assert out.shape == (b, t_out, cfg.out_dim)
    assert int(out_lens[0]) == t_out
    assert np.isfinite(np.asarray(out)).all()
    # padding region zeroed
    assert np.all(np.asarray(out[1, int(out_lens[1]) :]) == 0)


def test_zipformer_param_count_large():
    cfg = ZipformerConfig.large()
    shapes = jax.eval_shape(lambda k: init_zipformer(k, cfg), jax.random.PRNGKey(0))
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes)) / 1e6
    # k2-v2 is 159M total incl. decoder/joiner; encoder should be 130-155M
    assert 110 < n < 165, f"zipformer encoder {n:.1f}M params out of range"


def test_zipformer_batch_independence(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(1)
    a = rng.standard_normal((1, 128, cfg.feat_in)).astype(np.float32)
    b = rng.standard_normal((1, 128, cfg.feat_in)).astype(np.float32)
    ea, _ = zipformer_encode(params, jnp.asarray(a), jnp.array([128]), cfg)
    eboth, _ = zipformer_encode(
        params, jnp.asarray(np.concatenate([b, a])), jnp.array([128, 128]), cfg
    )
    np.testing.assert_allclose(np.asarray(ea[0]), np.asarray(eboth[1]), atol=2e-4, rtol=1e-3)


def test_zipformer_output_length_mirrors_device(tiny):
    """zipformer_output_length is the serving lane clock's host mirror of
    the device-reported elens (serving/continuous.py host_frames) — it must
    agree frame-for-frame across length parities and the short tail."""
    from reazonspeech_tpu.models.zipformer import zipformer_output_length

    cfg, params = tiny
    t = 209
    rng = np.random.default_rng(4)
    feats = jnp.asarray(
        rng.standard_normal((6, t, cfg.feat_in)), jnp.float32)
    lens = jnp.array([209, 208, 101, 100, 13, 7])
    _, out_lens = zipformer_encode(params, feats, lens, cfg)
    for n, e in zip(np.asarray(lens), np.asarray(out_lens)):
        assert zipformer_output_length(int(n), cfg) == int(e), int(n)
