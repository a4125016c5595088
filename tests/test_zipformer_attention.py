"""Zipformer shared-attention Pallas kernel vs the XLA path (interpret)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.models.zipformer import (
    ZipformerConfig,
    _layer,
    _compact_rel_pos,
    init_zipformer,
    zipformer_encode,
)
from reazonspeech_tpu.ops import zipformer_attention as za
# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow



@pytest.fixture(autouse=True)
def interpret_kernel(monkeypatch):
    """Run the kernel in interpreter mode on CPU."""
    orig = za.shared_rel_attention

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(za, "shared_rel_attention", patched)


def test_layer_pallas_matches_xla():
    from dataclasses import replace

    cfg = ZipformerConfig.tiny(compute_dtype="float32")
    params = init_zipformer(jax.random.PRNGKey(0), cfg)
    si = 0
    layer0 = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)[0]),
                          params["stacks"][si]["layers"])

    b, t, d = 2, 40, cfg.encoder_dim[si]
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d), jnp.float32)
    lengths = jnp.array([t, t - 13])
    mask = jnp.arange(t)[None, :] < lengths[:, None]
    pos_emb = jnp.asarray(_compact_rel_pos(t, cfg.pos_dim))

    want = _layer(layer0, x, pos_emb, mask, si, cfg)
    got = _layer(layer0, x, pos_emb, mask, si, replace(cfg, attn_impl="pallas"))

    m = np.asarray(mask)[..., None]
    diff = np.abs(np.asarray(got) - np.asarray(want)) * m
    scale = np.abs(np.asarray(want)).max()
    assert diff.max() / scale < 2e-5, (diff.max(), scale)


def test_encode_pallas_matches_xla():
    from dataclasses import replace

    cfg = ZipformerConfig.tiny(compute_dtype="float32")
    params = init_zipformer(jax.random.PRNGKey(2), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(3), (2, 80, cfg.feat_in), jnp.float32)
    lens = jnp.array([80, 57])

    want, wl = zipformer_encode(params, feats, lens, cfg)
    got, gl = zipformer_encode(params, feats, lens, replace(cfg, attn_impl="pallas"))
    np.testing.assert_array_equal(np.asarray(wl), np.asarray(gl))

    m = (np.arange(want.shape[1])[None, :] < np.asarray(wl)[:, None])[..., None]
    diff = np.abs(np.asarray(got) - np.asarray(want)) * m
    scale = np.abs(np.asarray(want)).max()
    assert diff.max() / scale < 5e-5, (diff.max(), scale)


def test_blockwise_shared_attention_matches_single_pass():
    """Streamed-KV shared attention equals the single-pass kernel."""
    import numpy as np

    rng = np.random.default_rng(5)
    g, t, qd, pd, dv, h = 4, 50, 8, 2, 4, 2
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    q, k = mk(g, t, qd), mk(g, t, qd)
    qp = mk(g, t, pd)
    pos = mk(h, 2 * t - 1, pd)
    v = mk(g, t, dv)
    lengths = jnp.array([t, t - 9, 17, 1])

    from reazonspeech_tpu.ops.zipformer_attention import (
        shared_rel_attention,
        shared_rel_attention_blockwise,
    )

    a = np.asarray(shared_rel_attention(
        q, k, qp, pos, v, lengths, heads=h, block_q=16, interpret=True))
    b = np.asarray(shared_rel_attention_blockwise(
        q, k, qp, pos, v, lengths, heads=h, block=16, interpret=True))
    for i, L in enumerate([t, t - 9, 17, 1]):
        np.testing.assert_allclose(a[i, :L], b[i, :L], atol=2e-5, rtol=1e-5)


def test_blockwise_shared_attention_rounded_lanes():
    """Force the hardware blk round-up (multiple of 64) in interpret mode —
    covers the blk > t geometry (t < 64) the real device always runs."""
    import numpy as np

    rng = np.random.default_rng(6)
    for t in (23, 50, 130):
        g, qd, pd, dv, h = 4, 8, 2, 4, 2
        mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
        q, k = mk(g, t, qd), mk(g, t, qd)
        qp = mk(g, t, pd)
        pos = mk(h, 2 * t - 1, pd)
        v = mk(g, t, dv)
        lens = [t, max(t - 9, 1), min(17, t), 1]
        lengths = jnp.array(lens)

        from reazonspeech_tpu.ops.zipformer_attention import (
            shared_rel_attention,
            shared_rel_attention_blockwise,
        )

        a = np.asarray(shared_rel_attention(
            q, k, qp, pos, v, lengths, heads=h, block_q=16, interpret=True))
        b = np.asarray(shared_rel_attention_blockwise(
            q, k, qp, pos, v, lengths, heads=h, block=64, interpret=True,
            round_lanes=True))
        for i, L in enumerate(lens):
            np.testing.assert_allclose(a[i, :L], b[i, :L], atol=2e-5, rtol=1e-5)


def test_encode_long_form_blockwise_path():
    """attn_impl=pallas beyond the single-pass cap routes to the blockwise
    kernel and matches the XLA path (forced via a tiny dispatch threshold)."""
    from dataclasses import replace

    import numpy as np

    from reazonspeech_tpu.models import zipformer as zf

    cfg = zf.ZipformerConfig.tiny(compute_dtype="float32")
    params = zf.init_zipformer(jax.random.PRNGKey(4), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(5), (1, 120, cfg.feat_in), jnp.float32)
    lens = jnp.array([120])

    want, wl = zf.zipformer_encode(params, feats, lens, cfg)

    # force every stack through the blockwise kernel regardless of length
    orig = zf._shared_attn_kernel
    try:
        from reazonspeech_tpu.ops import zipformer_attention as za

        zf._shared_attn_kernel = lambda t: (
            lambda *a, **kw: za.shared_rel_attention_blockwise(
                *a, **{**kw, "interpret": True}
            )
        )
        got, gl = zf.zipformer_encode(
            params, feats, lens, replace(cfg, attn_impl="pallas")
        )
    finally:
        zf._shared_attn_kernel = orig

    m = (np.arange(want.shape[1])[None, :] < np.asarray(wl)[:, None])[..., None]
    diff = np.abs(np.asarray(got) - np.asarray(want)) * m
    scale = np.abs(np.asarray(want)).max()
    assert diff.max() / scale < 5e-5, (diff.max(), scale)
