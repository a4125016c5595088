"""Parity gate: the Pallas rel-pos attention kernel (interpret mode on CPU)
against the XLA reference path in fastconformer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.ops.relpos_attention import relpos_attention


def xla_reference(qu, qv, k, v, pos, lengths):
    """The einsum + pad/reshape-shift implementation (fastconformer path)."""
    from reazonspeech_tpu.models.fastconformer import _rel_shift

    b, h, t, dh = qu.shape
    ac = jnp.einsum("bhtd,bhsd->bhts", qu, k, preferred_element_type=jnp.float32)
    posh = jnp.transpose(pos, (1, 0, 2))  # [H, 2T-1, dh]
    bd = jnp.einsum("bhtd,hld->bhtl", qv, posh, preferred_element_type=jnp.float32)
    bd = _rel_shift(bd)
    scores = (ac + bd) / np.sqrt(dh)
    mask = jnp.arange(t)[None, :] < lengths[:, None]
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhts,bhsd->bhtd", probs, v, preferred_element_type=jnp.float32)


def make_inputs(b, h, t, dh, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    return (
        mk(b, h, t, dh),
        mk(b, h, t, dh),
        mk(b, h, t, dh),
        mk(b, h, t, dh),
        mk(2 * t - 1, h, dh),
    )


@pytest.mark.parametrize("t,block_q", [(16, 16), (24, 8), (33, 16)])
def test_pallas_matches_xla(t, block_q):
    b, h, dh = 2, 3, 8
    qu, qv, k, v, pos = make_inputs(b, h, t, dh)
    lengths = jnp.array([t, max(t - 5, 1)])
    want = np.asarray(xla_reference(qu, qv, k, v, pos, lengths))
    got = np.asarray(
        relpos_attention(qu, qv, k, v, pos, lengths, block_q=block_q, interpret=True)
    )
    # rows beyond each element's valid length attend to garbage; compare valid
    for i, L in enumerate([t, max(t - 5, 1)]):
        np.testing.assert_allclose(got[i], want[i], atol=2e-5, rtol=1e-5)


def test_pallas_masking():
    b, h, t, dh = 1, 2, 16, 8
    qu, qv, k, v, pos = make_inputs(b, h, t, dh, seed=1)
    # changing keys beyond the valid length must not change the output
    lengths = jnp.array([10])
    out1 = np.asarray(relpos_attention(qu, qv, k, v, pos, lengths, block_q=16, interpret=True))
    k2 = k.at[:, :, 10:].set(99.0)
    v2 = v.at[:, :, 10:].set(-99.0)
    out2 = np.asarray(relpos_attention(qu, qv, k2, v2, pos, lengths, block_q=16, interpret=True))
    np.testing.assert_allclose(out1, out2, atol=1e-6)


from reazonspeech_tpu.ops.relpos_attention import relpos_attention_blockwise


@pytest.mark.parametrize("t,block", [(32, 16), (40, 16), (23, 8), (64, 16)])
def test_blockwise_matches_xla(t, block):
    """Streaming-KV variant: same outputs at any T, incl. non-multiples of
    the block and multiple KV blocks."""
    b, h, dh = 2, 3, 8
    qu, qv, k, v, pos = make_inputs(b, h, t, dh, seed=2)
    lengths = jnp.array([t, max(t - 7, 1)])
    want = np.asarray(xla_reference(qu, qv, k, v, pos, lengths))
    got = np.asarray(
        relpos_attention_blockwise(
            qu, qv, k, v, pos, lengths, block=block, interpret=True
        )
    )
    for i, L in enumerate([t, max(t - 7, 1)]):
        np.testing.assert_allclose(got[i, :, :L], want[i, :, :L], atol=2e-5, rtol=1e-5)


def test_blockwise_matches_single_pass():
    """Both kernels agree with each other (valid rows)."""
    b, h, t, dh = 1, 2, 48, 8
    qu, qv, k, v, pos = make_inputs(b, h, t, dh, seed=3)
    lengths = jnp.array([37])
    a = np.asarray(relpos_attention(qu, qv, k, v, pos, lengths, block_q=16, interpret=True))
    c = np.asarray(relpos_attention_blockwise(qu, qv, k, v, pos, lengths, block=16, interpret=True))
    np.testing.assert_allclose(a[0, :, :37], c[0, :, :37], atol=2e-5, rtol=1e-5)


def test_blockwise_masking():
    b, h, t, dh = 1, 2, 32, 8
    qu, qv, k, v, pos = make_inputs(b, h, t, dh, seed=4)
    lengths = jnp.array([20])
    out1 = np.asarray(relpos_attention_blockwise(qu, qv, k, v, pos, lengths, block=16, interpret=True))
    k2 = k.at[:, :, 20:].set(99.0)
    v2 = v.at[:, :, 20:].set(-99.0)
    out2 = np.asarray(relpos_attention_blockwise(qu, qv, k2, v2, pos, lengths, block=16, interpret=True))
    np.testing.assert_allclose(out1[:, :, :20], out2[:, :, :20], atol=1e-6)


def test_diff_wrapper_gradients_match_xla(monkeypatch):
    """relpos_attention_diff: kernel forward (interpret), XLA-VJP backward —
    gradients must equal differentiating the XLA formulation directly."""
    from reazonspeech_tpu.ops import relpos_attention as ra

    # route the forward through the interpret-mode kernel on CPU
    orig = ra.relpos_attention
    monkeypatch.setattr(
        ra, "relpos_attention",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )

    b, h, t, dh = 1, 2, 24, 8
    qu, qv, k, v, pos = make_inputs(b, h, t, dh, seed=7)
    lengths = jnp.array([20])

    def loss_kernel(args):
        qu, qv, k, v, pos = args
        out = ra.relpos_attention_diff(qu, qv, k, v, pos, lengths)
        m = (jnp.arange(t) < 20)[None, None, :, None]
        return jnp.sum(jnp.where(m, out, 0.0) ** 2)

    def loss_xla(args):
        qu, qv, k, v, pos = args
        out = ra._xla_reference(qu, qv, k, v, pos, lengths)
        m = (jnp.arange(t) < 20)[None, None, :, None]
        return jnp.sum(jnp.where(m, out, 0.0) ** 2)

    args = (qu, qv, k, v, pos)
    g_kernel = jax.grad(loss_kernel)(args)
    g_xla = jax.grad(loss_xla)(args)
    for a, b_ in zip(g_kernel, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-4)
