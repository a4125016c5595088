"""Parity gate: the fused LayerNorm+dense Pallas kernel vs the XLA
formulation it replaces (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.ops.ln_dense import (
    _add_ln_xla,
    _ln_dense_add_xla,
    _xla_reference,
    add_ln,
    add_ln_diff,
    ln_dense,
    ln_dense_add,
    ln_dense_add_diff,
    ln_dense_diff,
    ln_dense_supported,
)

# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow


def make_inputs(b, t, d, n, seed=0, x_dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t, d), dtype=np.float32) * 2.0
                    + rng.standard_normal((b, t, 1), dtype=np.float32)).astype(x_dtype)
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d, dtype=np.float32))
    bb = jnp.asarray(0.1 * rng.standard_normal(d, dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((d, n), dtype=np.float32) / np.sqrt(d))
    c = jnp.asarray(0.1 * rng.standard_normal(n, dtype=np.float32))
    return x, g, bb, w, c


@pytest.mark.parametrize("t,t_out,act", [
    (40, None, None),
    (40, None, "swish"),
    (120, 128, None),
    (250, 256, "swish"),
])
def test_matches_xla(t, t_out, act):
    x, g, b, w, c = make_inputs(3, t, 128, 256)
    wb = w.astype(jnp.bfloat16)
    got = np.asarray(ln_dense(x, g, b, wb, c, activation=act, t_out=t_out,
                              interpret=True), dtype=np.float32)
    want = np.asarray(_xla_reference(x, g, b, wb, c, act, t_out),
                      dtype=np.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_fp32_exactish():
    x, g, b, w, c = make_inputs(2, 64, 128, 128, seed=1)
    got = np.asarray(ln_dense(x, g, b, w, c, interpret=True))
    want = np.asarray(_xla_reference(x, g, b, w, c, None, None))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_t_out_rows_are_zero():
    x, g, b, w, c = make_inputs(2, 100, 128, 128)
    out = np.asarray(ln_dense(x, g, b, w, c, t_out=128, interpret=True))
    assert out.shape[1] == 128
    assert np.all(out[:, 100:] == 0)
    base = np.asarray(ln_dense(x, g, b, w, c, interpret=True))
    np.testing.assert_array_equal(out[:, :100], base)


@pytest.mark.parametrize("t,t_out,act", [(40, None, None), (120, 128, "swish")])
def test_ln_dense_add_matches_xla(t, t_out, act):
    r, g, b, w, c = make_inputs(3, t, 128, 256, seed=3)
    delta = jnp.asarray(
        np.random.default_rng(4).standard_normal((3, t, 128), dtype=np.float32)
    ).astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    got, stream = ln_dense_add(r, delta, g, b, wb, c, scale=0.5,
                               activation=act, t_out=t_out, interpret=True)
    want, want_stream = _ln_dense_add_xla(r, delta, g, b, wb, c, 0.5, act,
                                          t_out)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(stream)[:, :t],
                               np.asarray(want_stream), atol=1e-5, rtol=1e-5)


def test_ln_dense_add_multi_segment():
    r, g, b, w, c = make_inputs(2, 64, 128, 128, seed=5)
    delta = jnp.asarray(
        np.random.default_rng(6).standard_normal((2, 64, 128), dtype=np.float32))
    w2 = jnp.asarray(
        np.random.default_rng(7).standard_normal((128, 128), dtype=np.float32)
        / np.sqrt(128))
    got, stream = ln_dense_add(r, delta, g, b, (w, w2), (c, None),
                               scale=1.0, interpret=True)
    want, want_stream = _ln_dense_add_xla(r, delta, g, b, (w, w2), (c, None),
                                          1.0, None, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(want_stream),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("t,scale", [(40, 1.0), (96, 0.5)])
def test_add_ln_matches_xla(t, scale):
    rng = np.random.default_rng(8)
    r = jnp.asarray(rng.standard_normal((3, t, 128), dtype=np.float32) * 2.0)
    y = jnp.asarray(rng.standard_normal((3, t, 128), dtype=np.float32)
                    ).astype(jnp.bfloat16)
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(128, dtype=np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal(128, dtype=np.float32))
    lengths = jnp.array([t, t - 7, 3])
    got = np.asarray(add_ln(r, y, lengths, g, b, scale=scale, interpret=True))
    want = np.asarray(_add_ln_xla(r, y, lengths, g, b, scale, 1e-5,
                                  jnp.float32))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
    # masked rows are exactly zero
    assert np.all(got[1, t - 7:] == 0) and np.all(got[2, 3:] == 0)


def test_add_ln_and_lda_gradients_match_xla(monkeypatch):
    import reazonspeech_tpu.ops.ln_dense as M

    wrapped = M.add_ln.__wrapped__
    monkeypatch.setattr(
        M, "add_ln",
        lambda *a, **kw: wrapped(*a, **{**kw, "interpret": True}))
    rng = np.random.default_rng(9)
    t, d = 32, 128
    r = jnp.asarray(rng.standard_normal((2, t, d), dtype=np.float32))
    y = jnp.asarray(rng.standard_normal((2, t, d), dtype=np.float32))
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(d, dtype=np.float32))
    b = jnp.asarray(0.1 * rng.standard_normal(d, dtype=np.float32))
    lengths = jnp.array([t, t - 5])

    def loss_pallas(r_, y_, g_, b_):
        return jnp.sum(add_ln_diff(r_, y_, lengths, g_, b_, 0.5) ** 2)

    def loss_xla(r_, y_, g_, b_):
        return jnp.sum(
            M._add_ln_xla(r_, y_, lengths, g_, b_, 0.5, 1e-5, jnp.float32) ** 2)

    got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(r, y, g, b)
    want = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(r, y, g, b)
    for a, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w_),
                                   atol=1e-4, rtol=1e-4)


def test_supported_gate():
    assert ln_dense_supported(1024, 4096)
    assert ln_dense_supported(1024, 3072)
    assert not ln_dense_supported(1000, 4096)   # lane misaligned
    assert not ln_dense_supported(4096, 4096)   # W too large for VMEM


def _interpret_all(monkeypatch):
    """Route every serving kernel through interpret mode (shared registry in
    reazonspeech_tpu/ops/testing.py)."""
    from reazonspeech_tpu.ops.testing import patch_interpret

    patch_interpret(monkeypatch)


@pytest.mark.parametrize("style", ["nemo", "espnet"])
def test_model_lnd_impl_pallas_wiring(monkeypatch, style):
    """fastconformer_encode with lnd_impl="pallas" (fused-LN FFN, packed qkv
    attention at the 128-aligned T, in-kernel conv LN) against the all-XLA
    path, fp32 compute, interpret mode on CPU. The espnet variant exercises
    layer-norm conv, encoder final_norm, and conv2d subsampling."""
    from dataclasses import replace

    from reazonspeech_tpu.models.fastconformer import (
        FastConformerConfig,
        fastconformer_encode,
        init_fastconformer,
    )

    _interpret_all(monkeypatch)

    extra = {} if style == "nemo" else dict(
        conv_norm="layer_norm", final_norm=True, subsampling_style="conv2d",
        subsampling_factor=4)
    cfg = FastConformerConfig.tiny(
        d_model=128, num_heads=4, compute_dtype="float32", **extra)
    params = init_fastconformer(jax.random.PRNGKey(0), cfg)
    # T_mel=200 -> T=25: NOT 128-aligned, so the packed path pads to 128
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 200, cfg.feat_in))
    lens = jnp.array([200, 130])

    want, wl = fastconformer_encode(params, feats, lens, cfg)
    got, gl = fastconformer_encode(
        params, feats, lens,
        replace(cfg, attn_impl="pallas", conv_impl="pallas",
                lnd_impl="pallas"))
    np.testing.assert_array_equal(np.asarray(wl), np.asarray(gl))
    assert got.shape == want.shape
    m = (np.arange(want.shape[1])[None, :] < np.asarray(wl)[:, None])[..., None]
    diff = np.abs(np.asarray(got) - np.asarray(want)) * m
    assert diff.max() < 5e-5, diff.max()


def test_model_fused_residual_block_wiring(monkeypatch):
    """fastconformer_encode at a 128-aligned T with lnd_impl="pallas": the
    fused-residual block tail is active (_residual_fusion_ok) — the ffn1 add
    rides the qkv ln_dense (ln_dense_add) and the ffn2 add + final LayerNorm
    + masking collapse into add_ln. Must match the all-XLA path."""
    from dataclasses import replace

    from reazonspeech_tpu.models import fastconformer as FC

    _interpret_all(monkeypatch)

    cfg = FC.FastConformerConfig.tiny(
        d_model=128, num_heads=4, compute_dtype="float32")
    params = FC.init_fastconformer(jax.random.PRNGKey(0), cfg)
    # T_mel=1024 -> T=128 after 8x subsampling: 128-aligned, fused tail on
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 1024, cfg.feat_in))
    lens = jnp.array([1024, 700])

    pcfg = replace(cfg, attn_impl="pallas", conv_impl="pallas",
                   lnd_impl="pallas")
    assert FC._residual_fusion_ok(pcfg, 128)

    want, wl = FC.fastconformer_encode(params, feats, lens, cfg)
    got, gl = FC.fastconformer_encode(params, feats, lens, pcfg)
    np.testing.assert_array_equal(np.asarray(wl), np.asarray(gl))
    m = (np.arange(want.shape[1])[None, :] < np.asarray(wl)[:, None])[..., None]
    diff = np.abs(np.asarray(got) - np.asarray(want)) * m
    assert diff.max() < 5e-5, diff.max()
    # padded rows are exactly zero on the fused path (add_ln masks in-kernel)
    pad = np.asarray(got) * (1 - m)
    assert np.abs(pad).max() == 0.0


def test_diff_gradients_match_xla(monkeypatch):
    import reazonspeech_tpu.ops.ln_dense as M
    orig = M.ln_dense
    monkeypatch.setattr(
        M, "ln_dense",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))

    x, g, b, w, c = make_inputs(2, 40, 128, 128, seed=2)

    def loss_kernel(args):
        x, g, b, w, c = args
        return jnp.sum(jnp.square(
            ln_dense_diff(x, g, b, w, c, "swish", None).astype(jnp.float32)))

    def loss_xla(args):
        x, g, b, w, c = args
        return jnp.sum(jnp.square(
            _xla_reference(x, g, b, w, c, "swish", None).astype(jnp.float32)))

    args = (x, g, b, w, c)
    gk = jax.grad(loss_kernel)(args)
    gx = jax.grad(loss_xla)(args)
    for a, e in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=1e-3, rtol=1e-3)
