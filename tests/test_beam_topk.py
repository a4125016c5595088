"""ops/beam_topk.py: fused log-softmax + blank split + top-m vs the XLA
reference chain, and decode-level equivalence of the topk_impl switch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.ops.beam_topk import topm_logsoftmax, topm_logsoftmax_xla


@pytest.mark.parametrize(
    "r,v,m,blank",
    [
        (6, 11, 4, 10),    # odd V (lane pad masked), blank last (nemo)
        (6, 11, 4, 0),     # blank first (espnet/k2)
        (300, 257, 20, 0),  # R spans grid blocks, beam-20
        (4, 5, 4, 0),      # m == V-1: every label selected
    ],
)
def test_matches_xla_reference(r, v, m, blank):
    x = jax.random.normal(jax.random.PRNGKey(0), (r, v), jnp.float32) * 3.0
    lpb, lp, tok = topm_logsoftmax(x, m, blank, block_r=128, interpret=True)
    wlpb, wlp, wtok = topm_logsoftmax_xla(x, m, blank)
    np.testing.assert_allclose(np.asarray(lpb), np.asarray(wlpb),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(wlp),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(wtok))


def test_tie_order_matches_top_k():
    # duplicate values: top_k returns the LOWEST index first among ties
    x = jnp.asarray(
        np.array(
            [[1.0, 5.0, 5.0, 5.0, 0.0, 5.0],
             [2.0, 2.0, 2.0, 2.0, 2.0, 2.0]],
            np.float32,
        )
    )
    _, lp, tok = topm_logsoftmax(x, 4, 0, interpret=True)
    _, wlp, wtok = topm_logsoftmax_xla(x, 4, 0)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(wtok))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(wlp), atol=1e-6)


def test_bf16_logits_fp32_logp():
    x = (jax.random.normal(jax.random.PRNGKey(1), (8, 33)) * 2).astype(
        jnp.bfloat16)
    lpb, lp, tok = topm_logsoftmax(x, 3, 0, interpret=True)
    wlpb, wlp, wtok = topm_logsoftmax_xla(x, 3, 0)
    assert lp.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(wtok))
    np.testing.assert_allclose(np.asarray(lpb), np.asarray(wlpb), atol=1e-5)


def test_decode_topk_impl_equivalence(monkeypatch):
    """rnnt_beam_decode(topk_impl="pallas") == the XLA chain, end to end."""
    from dataclasses import replace

    from reazonspeech_tpu.decoding.rnnt_beam import (
        BeamDecodeConfig,
        rnnt_beam_decode,
    )
    from reazonspeech_tpu.models.rnnt import RNNTConfig, init_predictor, init_joint
    from reazonspeech_tpu.ops.testing import patch_interpret

    patch_interpret(monkeypatch, names={"topm_logsoftmax"})

    rnnt_cfg = RNNTConfig.tiny()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    pred = init_predictor(k1, rnnt_cfg)
    joint = init_joint(k2, rnnt_cfg)
    enc = jax.random.normal(k3, (2, 9, rnnt_cfg.enc_dim), jnp.float32)
    lens = jnp.array([9, 6])

    cfg = BeamDecodeConfig(beam_size=3)
    want = rnnt_beam_decode(pred, joint, enc, lens, rnnt_cfg, cfg)
    got = rnnt_beam_decode(
        pred, joint, enc, lens, rnnt_cfg, replace(cfg, topk_impl="pallas"))
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32),
            atol=1e-5, rtol=1e-5)


def test_graves_topk_impl_equivalence(monkeypatch):
    from dataclasses import replace

    from reazonspeech_tpu.decoding.transducer_graves import (
        GravesBeamConfig,
        graves_beam_decode,
    )
    from reazonspeech_tpu.models.rnnt import RNNTConfig, init_predictor, init_joint
    from reazonspeech_tpu.ops.testing import patch_interpret

    patch_interpret(monkeypatch, names={"topm_logsoftmax"})

    rnnt_cfg = RNNTConfig.tiny(blank_position="first", predictor_kind="lstm")
    key = jax.random.PRNGKey(4)
    k1, k2, k3 = jax.random.split(key, 3)
    pred = init_predictor(k1, rnnt_cfg)
    joint = init_joint(k2, rnnt_cfg)
    enc = jax.random.normal(k3, (2, 7, rnnt_cfg.enc_dim), jnp.float32)
    lens = jnp.array([7, 5])

    cfg = GravesBeamConfig(beam_size=4)
    want = graves_beam_decode(pred, joint, enc, lens, rnnt_cfg, cfg)
    got = graves_beam_decode(
        pred, joint, enc, lens, rnnt_cfg, replace(cfg, topk_impl="pallas"))
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(w, np.float32),
            atol=1e-5, rtol=1e-5)
