"""Parity gate: the fused LayerNorm+dense Pallas kernel vs the XLA
formulation it replaces (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.ops.ln_dense import (
    ln_dense,
    ln_dense_diff,
    ln_dense_supported,
    _xla_reference,
)


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
