"""Fused conv-module Pallas kernel vs the XLA reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.models.fastconformer import FastConformerConfig, _conv_module
from reazonspeech_tpu.models.layers import (
    batch_norm_init,
    conv1d_init,
    depthwise_conv1d_init,
    layer_norm_init,
)
from reazonspeech_tpu.ops.conformer_conv import fold_batch_norm, fused_conv_module
# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow



def _params(key, d, k):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv_ln": layer_norm_init(d),
        "conv_in": conv1d_init(k1, d, 2 * d, 1),
        "conv_dw": depthwise_conv1d_init(k2, d, k),
        "conv_out": conv1d_init(k3, d, d, 1),
        "conv_bn": batch_norm_init(d),
    }
    # non-trivial pre-module LayerNorm and batch-norm statistics
    p["conv_ln"]["scale"] = jax.random.normal(k2, (d,)) * 0.1 + 1.0
    p["conv_ln"]["bias"] = jax.random.normal(k3, (d,)) * 0.1
    p["conv_bn"]["mean"] = jax.random.normal(k1, (d,)) * 0.1
    p["conv_bn"]["var"] = jax.random.uniform(k2, (d,), minval=0.5, maxval=2.0)
    p["conv_bn"]["scale"] = jax.random.normal(k3, (d,)) * 0.2 + 1.0
    return p


def _run_kernel(p, x, lengths, in_ln=False):
    """x is the raw residual stream; in_ln=True exercises the in-kernel
    LayerNorm, else the caller-side LN is applied first (original contract)."""
    from reazonspeech_tpu.models.layers import layer_norm

    scale, bias = fold_batch_norm(p["conv_bn"])
    ln_kw = (
        dict(ln_scale=p["conv_ln"]["scale"], ln_bias=p["conv_ln"]["bias"],
             compute_dtype=x.dtype)
        if in_ln else {}
    )
    xin = x if in_ln else layer_norm(p["conv_ln"], x)
    return fused_conv_module(
        xin, lengths,
        p["conv_in"]["w"][0], p["conv_in"]["b"],
        p["conv_dw"]["w"], p["conv_dw"]["b"],
        scale, bias,
        p["conv_out"]["w"][0], p["conv_out"]["b"],
        interpret=True,
        **ln_kw,
    )


@pytest.mark.parametrize("t,k", [(64, 9), (48, 31)])
@pytest.mark.parametrize("in_ln", [False, True])
def test_fused_conv_module_matches_xla(t, k, in_ln):
    d = 128
    cfg = FastConformerConfig.tiny(d_model=d, conv_kernel=k, compute_dtype="float32")
    p = _params(jax.random.PRNGKey(0), d, k)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, t, d), jnp.float32)
    lengths = jnp.array([t, t - 7, 5], jnp.int32)
    mask = jnp.arange(t)[None, :] < lengths[:, None]

    want = _conv_module(p, x, mask, cfg)  # XLA path incl. the pre-module LN
    got = _run_kernel(p, x, lengths, in_ln=in_ln)

    m = np.asarray(mask)[..., None]
    diff = np.abs(np.asarray(got) - np.asarray(want)) * m
    assert diff.max() < 2e-5, diff.max()


def test_fused_conv_module_padding_isolation():
    """Valid frames must not change when padding content changes."""
    d, t, k = 128, 32, 9
    p = _params(jax.random.PRNGKey(2), d, k)
    lengths = jnp.array([20], jnp.int32)
    x1 = jax.random.normal(jax.random.PRNGKey(3), (1, t, d), jnp.float32)
    x2 = x1.at[:, 20:].set(99.0)

    y1 = np.asarray(_run_kernel(p, x1, lengths))[:, :20]
    y2 = np.asarray(_run_kernel(p, x2, lengths))[:, :20]
    np.testing.assert_allclose(y1, y2, rtol=0, atol=1e-6)


def test_model_conv_impl_pallas_wiring(monkeypatch):
    """The model's conv_impl="pallas" branch (weight plumbing, norm choice,
    bf16 policy) against the XLA branch, via interpret mode on CPU."""
    from dataclasses import replace

    from reazonspeech_tpu.ops import conformer_conv as cc

    orig = cc.fused_conv_module

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(cc, "fused_conv_module", patched)

    from reazonspeech_tpu.models.fastconformer import (
        FastConformerConfig,
        fastconformer_encode,
        init_fastconformer,
    )

    for conv_norm in ("batch_norm", "layer_norm"):
        cfg = FastConformerConfig.tiny(
            compute_dtype="float32", conv_norm=conv_norm
        )
        params = init_fastconformer(jax.random.PRNGKey(0), cfg)
        feats = jax.random.normal(jax.random.PRNGKey(1), (2, 64, cfg.feat_in))
        lens = jnp.array([64, 40])

        want, wl = fastconformer_encode(params, feats, lens, cfg)
        got, gl = fastconformer_encode(
            params, feats, lens, replace(cfg, conv_impl="pallas")
        )
        m = (np.arange(want.shape[1])[None, :] < np.asarray(wl)[:, None])[..., None]
        diff = np.abs(np.asarray(got) - np.asarray(want)) * m
        assert diff.max() < 5e-5, (conv_norm, diff.max())
