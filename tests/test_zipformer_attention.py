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
