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
# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow



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


@pytest.mark.parametrize("t", [23, 40, 150])
def test_blockwise_rounded_lane_geometry(t):
    """The hardware path rounds blk up to a multiple of 64 — force that
    rounding in interpret mode so the real geometry (incl. blk > t when
    t < 64, and the pos re-pad that it relies on) is test-covered."""
    b, h, dh = 2, 3, 8
    qu, qv, k, v, pos = make_inputs(b, h, t, dh, seed=7)
    lengths = jnp.array([t, max(t - 5, 1)])
    want = np.asarray(xla_reference(qu, qv, k, v, pos, lengths))
    got = np.asarray(
        relpos_attention_blockwise(
            qu, qv, k, v, pos, lengths, block=64, interpret=True,
            round_lanes=True,
        )
    )
    for i, L in enumerate([t, max(t - 5, 1)]):
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


# ---------------------------------------------------------------------------
# layout-fused variant ([B, T, D] in/out, in-kernel biases, packed heads)
# ---------------------------------------------------------------------------


def make_fused_inputs(b, h, t, dh, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    return (
        mk(b, t, h * dh),
        mk(b, t, h * dh),
        mk(b, t, h * dh),
        mk(2 * t - 1, h, dh),
        mk(h, dh),
        mk(h, dh),
    )


@pytest.mark.parametrize("h,dh", [(2, 8), (4, 8), (2, 16)])
@pytest.mark.parametrize("t", [16, 25, 33])
def test_fused_matches_xla(h, dh, t):
    from reazonspeech_tpu.ops.relpos_attention import relpos_attention_fused

    b = 2
    q, k, v, pos, bu, bv = make_fused_inputs(b, h, t, dh)
    lengths = jnp.array([t, max(t - 7, 1)])

    r = lambda x: jnp.transpose(x.reshape(b, t, h, dh), (0, 2, 1, 3))
    qu = r(q) + bu[None, :, None, :]
    qv = r(q) + bv[None, :, None, :]
    want = np.asarray(xla_reference(qu, qv, r(k), r(v), pos, lengths))
    want = np.transpose(want, (0, 2, 1, 3)).reshape(b, t, h * dh)

    got = np.asarray(
        relpos_attention_fused(q, k, v, pos, bu, bv, lengths, heads=h,
                               interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_fused_packed_heads_match_unpacked():
    """hpb > 1 (dh < 128 lane packing) must equal the per-head math."""
    from reazonspeech_tpu.ops.relpos_attention import relpos_attention_fused

    b, h, t, dh = 1, 4, 16, 8
    q, k, v, pos, bu, bv = make_fused_inputs(b, h, t, dh, seed=3)
    lengths = jnp.array([t])
    got = np.asarray(
        relpos_attention_fused(q, k, v, pos, bu, bv, lengths, heads=h,
                               interpret=True)
    ).reshape(b, t, h, dh)
    # per-head single-head calls
    for head in range(h):
        sl = slice(head * dh, (head + 1) * dh)
        one = np.asarray(
            relpos_attention_fused(
                q[..., sl], k[..., sl], v[..., sl], pos[:, head : head + 1],
                bu[head : head + 1], bv[head : head + 1], lengths, heads=1,
                interpret=True,
            )
        )
        np.testing.assert_allclose(got[:, :, head], one, atol=2e-5, rtol=1e-5)


def test_fused_masking():
    from reazonspeech_tpu.ops.relpos_attention import relpos_attention_fused

    b, h, t, dh = 1, 2, 24, 8
    q, k, v, pos, bu, bv = make_fused_inputs(b, h, t, dh, seed=5)
    lengths = jnp.array([17])
    out1 = np.asarray(relpos_attention_fused(q, k, v, pos, bu, bv, lengths,
                                             heads=h, interpret=True))
    k2 = k.at[:, 17:].set(99.0)
    v2 = v.at[:, 17:].set(-99.0)
    out2 = np.asarray(relpos_attention_fused(q, k2, v2, pos, bu, bv, lengths,
                                             heads=h, interpret=True))
    np.testing.assert_allclose(out1[:, :17], out2[:, :17], atol=1e-6)


def test_fused_supported_gate():
    from reazonspeech_tpu.ops.relpos_attention import fused_supported

    assert fused_supported(375, 8, 128)      # nemo serving chunk
    assert fused_supported(500, 8, 64)       # espnet serving chunk
    assert not fused_supported(2000, 8, 128)  # long-form -> blockwise path
    assert not fused_supported(100, 4, 16)    # tiny test config: hpb > heads
    assert not fused_supported(100, 8, 96)    # non-lane-divisible head dim


def test_fused_diff_gradients_match_xla(monkeypatch):
    from reazonspeech_tpu.ops import relpos_attention as ra

    orig = ra.relpos_attention_fused
    monkeypatch.setattr(
        ra, "relpos_attention_fused",
        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
    )

    b, h, t, dh = 1, 2, 24, 8
    q, k, v, pos, bu, bv = make_fused_inputs(b, h, t, dh, seed=7)
    lengths = jnp.array([20])

    def loss_kernel(args):
        q, k, v, pos, bu, bv = args
        out = ra.relpos_attention_fused_diff(q, k, v, pos, bu, bv, lengths, h)
        m = (jnp.arange(t) < 20)[None, :, None]
        return jnp.sum(jnp.where(m, out, 0.0) ** 2)

    def loss_xla(args):
        q, k, v, pos, bu, bv = args
        out = ra._fused_xla_reference(q, k, v, pos, bu, bv, lengths)
        m = (jnp.arange(t) < 20)[None, :, None]
        return jnp.sum(jnp.where(m, out, 0.0) ** 2)

    args = (q, k, v, pos, bu, bv)
    g_kernel = jax.grad(loss_kernel)(args)
    g_xla = jax.grad(loss_xla)(args)
    for a, b_ in zip(g_kernel, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-4)
