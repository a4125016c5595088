"""Beam-decode `unroll` (steps per while_loop iteration) is output-exact:
all per-step updates are masked for finished elements, so any unroll factor
must reproduce the unroll=1 decode bit-for-bit."""

from dataclasses import replace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.models.rnnt import RNNTConfig, init_joint, init_predictor
# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow



def _setup(blank_position, seed=0):
    rnnt_cfg = RNNTConfig(
        vocab_size=40, enc_dim=32, pred_hidden=64, joint_hidden=48,
        blank_position=blank_position, compute_dtype="float32",
        joint_activation="tanh" if blank_position == "first" else "relu",
    )
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    pred = init_predictor(k1, rnnt_cfg)
    joint = init_joint(k2, rnnt_cfg)
    enc = jax.random.normal(k3, (3, 11, rnnt_cfg.enc_dim), jnp.float32)
    lens = jnp.asarray([11, 8, 3], jnp.int32)
    return rnnt_cfg, pred, joint, enc, lens


@pytest.mark.parametrize("unroll", [2, 3])
def test_alsd_unroll_exact(unroll):
    from reazonspeech_tpu.decoding.rnnt_beam import (
        BeamDecodeConfig, rnnt_beam_decode)

    rnnt_cfg, pred, joint, enc, lens = _setup("last")
    cfg = BeamDecodeConfig(beam_size=3)
    ref = rnnt_beam_decode(pred, joint, enc, lens, rnnt_cfg, cfg)
    out = rnnt_beam_decode(pred, joint, enc, lens, rnnt_cfg,
                           replace(cfg, unroll=unroll))
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(o))


@pytest.mark.parametrize("unroll", [2, 3])
def test_graves_unroll_exact(unroll):
    from reazonspeech_tpu.decoding.transducer_graves import (
        GravesBeamConfig, graves_beam_decode)

    rnnt_cfg, pred, joint, enc, lens = _setup("first")
    cfg = GravesBeamConfig(beam_size=4)
    ref = graves_beam_decode(pred, joint, enc, lens, rnnt_cfg, cfg)
    out = graves_beam_decode(pred, joint, enc, lens, rnnt_cfg,
                             replace(cfg, unroll=unroll))
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(o))


def test_graves_unroll_exact_at_pop_cap():
    """Unrolled pops that overshoot the pop cap land on the scratch slots
    (index clamping) and must not perturb results — exercise a config whose
    cap binds (tiny max_pops_per_frame forces saturation)."""
    from reazonspeech_tpu.decoding.transducer_graves import (
        GravesBeamConfig, graves_beam_decode)

    rnnt_cfg, pred, joint, enc, lens = _setup("first", seed=7)
    cfg = GravesBeamConfig(beam_size=4, max_pops_per_frame=5,
                           kept_capacity=6)
    ref = graves_beam_decode(pred, joint, enc, lens, rnnt_cfg, cfg)
    out = graves_beam_decode(pred, joint, enc, lens, rnnt_cfg,
                             replace(cfg, unroll=3))
    assert bool(np.asarray(ref[4]).any())  # the cap actually bound
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(o))
