"""ops/lstm_step.py + ops/beam_topk.joint_topm: fused decode-step kernels vs
their XLA reference formulations, and decode-level equivalence of the
lstm_impl/joint_impl switches in both beam decoders."""

from dataclasses import replace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.ops.beam_topk import joint_topm, joint_topm_xla
from reazonspeech_tpu.ops.lstm_step import lstm_cell_step, lstm_cell_step_xla


@pytest.mark.parametrize("r,h", [(6, 128), (300, 256)])
def test_lstm_cell_matches_xla_fp32(r, h):
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    w_ih = jax.random.normal(ks[0], (h, 4 * h)) * 0.1
    w_hh = jax.random.normal(ks[1], (h, 4 * h)) * 0.1
    b = jax.random.normal(ks[2], (4 * h,)) * 0.1
    x = jax.random.normal(ks[3], (r, h))
    hp = jax.random.normal(ks[4], (r, h))
    cp = jax.random.normal(ks[5], (r, h))
    hn, cn = lstm_cell_step(w_ih, w_hh, b, x, hp, cp,
                            compute_dtype="float32", block_r=128,
                            interpret=True)
    hr, cr = lstm_cell_step_xla(w_ih, w_hh, b, x, hp, cp,
                                compute_dtype="float32")
    np.testing.assert_allclose(np.asarray(hn), np.asarray(hr), atol=2e-6)
    np.testing.assert_allclose(np.asarray(cn), np.asarray(cr), atol=2e-6)


def test_lstm_cell_bf16_within_bf16_rounding():
    # bf16 compute follows the XLA chain's structure; backends may differ in
    # accumulation association, so the bound is bf16-resolution, not exact
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    h = 128
    w_ih = jax.random.normal(ks[0], (h, 4 * h)) * 0.1
    w_hh = jax.random.normal(ks[1], (h, 4 * h)) * 0.1
    b = jax.random.normal(ks[2], (4 * h,)) * 0.1
    x = jax.random.normal(ks[3], (16, h))
    hp = jax.random.normal(ks[4], (16, h))
    cp = jax.random.normal(ks[5], (16, h))
    hn, cn = lstm_cell_step(w_ih, w_hh, b, x, hp, cp, interpret=True)
    hr, cr = lstm_cell_step_xla(w_ih, w_hh, b, x, hp, cp)
    np.testing.assert_allclose(np.asarray(hn), np.asarray(hr), atol=2e-2)
    np.testing.assert_allclose(np.asarray(cn), np.asarray(cr), atol=2e-2)


@pytest.mark.parametrize(
    "act,blank,v", [("relu", 300, 301), ("tanh", 0, 301), ("sigmoid", 0, 64)]
)
def test_joint_topm_matches_xla_fp32(act, blank, v):
    r, hdim, j, m = 48, 128, 256, 4
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    wp = jax.random.normal(ks[0], (hdim, j)) * 0.1
    bp = jax.random.normal(ks[1], (j,)) * 0.1
    wo = jax.random.normal(ks[2], (j, v)) * 0.1
    bo = jax.random.normal(ks[3], (v,)) * 0.1
    enc = jax.random.normal(ks[4], (r, j))
    dec = jax.random.normal(ks[5], (r, hdim))
    lpb, lp, tok = joint_topm(wp, bp, wo, bo, enc, dec, m, blank,
                              activation=act, compute_dtype="float32",
                              block_r=32, interpret=True)
    rlpb, rlp, rtok = joint_topm_xla(wp, bp, wo, bo, enc, dec, m, blank,
                                     activation=act,
                                     compute_dtype="float32")
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(rtok))
    np.testing.assert_allclose(np.asarray(lpb), np.asarray(rlpb), atol=5e-6)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(rlp), atol=5e-6)


def _beam_setup(seed=0, blank_position="last"):
    from reazonspeech_tpu.models.rnnt import (
        RNNTConfig, init_joint, init_predictor)

    rnnt_cfg = RNNTConfig(
        vocab_size=40, enc_dim=32, pred_hidden=128, joint_hidden=64,
        blank_position=blank_position,
        joint_activation="tanh" if blank_position == "first" else "relu",
    )
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    pred = init_predictor(k1, rnnt_cfg)
    joint = init_joint(k2, rnnt_cfg)
    enc = jax.random.normal(k3, (3, 12, rnnt_cfg.enc_dim), jnp.float32)
    lens = jnp.asarray([12, 9, 5], jnp.int32)
    return rnnt_cfg, pred, joint, enc, lens


def test_alsd_fused_impls_equivalent(monkeypatch):
    """rnnt_beam_decode with joint_impl/lstm_impl pallas == the fp32-chain
    decode (fp32 enc/joint keeps the reference chain fp32 too, so fused and
    XLA agree to rounding; tokens must be identical)."""
    from reazonspeech_tpu.decoding.rnnt_beam import (
        BeamDecodeConfig, rnnt_beam_decode)
    from reazonspeech_tpu.ops import testing as ot

    ot.patch_interpret(monkeypatch, names=("joint_topm", "lstm_cell_step",
                                           "topm_logsoftmax"))
    rnnt_cfg, pred, joint, enc, lens = _beam_setup()
    rnnt_cfg = replace(rnnt_cfg, compute_dtype="float32")
    cfg = BeamDecodeConfig(beam_size=3)
    ref = rnnt_beam_decode(pred, joint, enc, lens, rnnt_cfg, cfg)
    out = rnnt_beam_decode(
        pred, joint, enc, lens, rnnt_cfg,
        replace(cfg, joint_impl="pallas", lstm_impl="pallas"))
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(ref[2]))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(ref[1]))
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(ref[3]),
                               atol=1e-5)


def test_graves_fused_impls_equivalent(monkeypatch):
    from reazonspeech_tpu.decoding.transducer_graves import (
        GravesBeamConfig, graves_beam_decode)
    from reazonspeech_tpu.ops import testing as ot

    ot.patch_interpret(monkeypatch, names=("joint_topm", "lstm_cell_step",
                                           "topm_logsoftmax"))
    rnnt_cfg, pred, joint, enc, lens = _beam_setup(blank_position="first")
    rnnt_cfg = replace(rnnt_cfg, compute_dtype="float32")
    cfg = GravesBeamConfig(beam_size=4)
    ref = graves_beam_decode(pred, joint, enc, lens, rnnt_cfg, cfg)
    out = graves_beam_decode(
        pred, joint, enc, lens, rnnt_cfg,
        replace(cfg, joint_impl="pallas", lstm_impl="pallas"))
    np.testing.assert_array_equal(np.asarray(out[2]), np.asarray(ref[2]))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(ref[3]),
                               atol=1e-5)


def test_lstm_impl_ignored_for_stateless():
    """k2-style stateless predictors fall back to the XLA predictor_step."""
    from reazonspeech_tpu.decoding.rnnt_beam import (
        BeamDecodeConfig, rnnt_beam_decode)
    from reazonspeech_tpu.models.rnnt import (
        RNNTConfig, init_joint, init_predictor)

    rnnt_cfg = RNNTConfig(
        vocab_size=40, enc_dim=32, pred_hidden=128, joint_hidden=64,
        predictor_kind="stateless", compute_dtype="float32")
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    pred = init_predictor(k1, rnnt_cfg)
    joint = init_joint(k2, rnnt_cfg)
    enc = jax.random.normal(k3, (2, 8, rnnt_cfg.enc_dim), jnp.float32)
    lens = jnp.asarray([8, 6], jnp.int32)
    cfg = BeamDecodeConfig(beam_size=2)
    ref = rnnt_beam_decode(pred, joint, enc, lens, rnnt_cfg, cfg)
    out = rnnt_beam_decode(pred, joint, enc, lens, rnnt_cfg,
                           replace(cfg, lstm_impl="pallas"))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ref[0]))
