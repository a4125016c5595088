"""Graves-style transducer beam (ESPnet default_beam_search) vs its serial
oracle, plus fixed-shape invariances."""

import glob
import os
import sys
import tempfile

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from reazonspeech_tpu.decoding.transducer_graves import (
    GravesBeamConfig,
    graves_beam_decode,
)
from reazonspeech_tpu.models.rnnt import RNNTConfig
# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def espnet_weights():
    """Fixture espnet-zoo checkpoint shared by torch-sd and JAX worlds,
    with a mildly blank-biased joint so emissions are sparse (realistic)."""
    from fixture_checkpoints import write_espnet_zoo

    from reazonspeech_tpu.convert.espnet_conformer import convert_espnet_checkpoint
    from reazonspeech_tpu.models.conformer import espnet_encoder_config

    with tempfile.TemporaryDirectory() as td:
        enc_cfg = espnet_encoder_config(
            num_layers=2, d_model=32, num_heads=4, subsampling_channels=32
        )
        tokens = ["<blank>"] + [chr(c) for c in range(0x3041, 0x3041 + 40)] + ["<sos/eos>"]
        rnnt_cfg = RNNTConfig(
            vocab_size=len(tokens), enc_dim=enc_cfg.d_model, pred_hidden=24,
            joint_hidden=32, joint_activation="tanh", blank_position="first",
            compute_dtype="float32",
        )
        sd = write_espnet_zoo(td, enc_cfg, tokens, rnnt_cfg)
        sd["joint_network.lin_out.bias"] = sd["joint_network.lin_out.bias"].clone()
        sd["joint_network.lin_out.bias"][0] += 2.0
        pth = glob.glob(os.path.join(td, "exp", "*", "*.pth"))[0]
        torch.save(sd, pth)
        cfgy = glob.glob(os.path.join(td, "exp", "*", "config.yaml"))[0]
        params, *_ = convert_espnet_checkpoint(
            pth, os.path.join(td, "conv"), config_yaml=cfgy
        )
        sd = {k: v.float() for k, v in sd.items()}
        jp = jax.tree.map(jnp.asarray, params)
        yield sd, jp, rnnt_cfg


@pytest.mark.parametrize(
    "beam,seed,multipop",
    [(4, 3, 1), (20, 11, 1), (20, 12, 1),
     # round-based speculative expansion must stay oracle-exact
     (4, 3, 4), (20, 11, 8), (20, 12, 16), (20, 11, 32)],
)
def test_matches_serial_oracle(espnet_weights, beam, seed, multipop):
    """Batched fixed-shape Graves beam == the serial ESPnet-reading oracle
    token-and-frame exact (same bounds on both sides)."""
    from torch_reference import espnet_default_beam_reference

    sd, jp, rnnt_cfg = espnet_weights
    rng = np.random.default_rng(seed)
    t = 24
    enc = rng.standard_normal((3, t, rnnt_cfg.enc_dim)).astype(np.float32)
    lens = [24, 17, 9]
    cfg = GravesBeamConfig(beam_size=beam, multipop=multipop)
    bt, bf, bc, bs, sat = graves_beam_decode(
        jp["predictor"], jp["joint"], jnp.asarray(enc), jnp.asarray(lens),
        rnnt_cfg, cfg,
    )
    bt, bf, bc, bs = [np.asarray(x) for x in (bt, bf, bc, bs)]
    k = min(beam, rnnt_cfg.vocab_size)
    for i, L in enumerate(lens):
        rt, rf, rs = espnet_default_beam_reference(
            sd, torch.from_numpy(enc[i, :L]), rnnt_cfg.vocab_size,
            beam_size=beam, max_pops_per_frame=6 * k + 8,
            kept_capacity=k + 12, max_tokens=t, joint_activation="tanh",
        )
        c = int(bc[i])
        assert bt[i, :c].tolist() == rt, (beam, seed, i)
        assert bf[i, :c].tolist() == rf, (beam, seed, i)
        np.testing.assert_allclose(float(bs[i]), rs, atol=1e-3)


@pytest.mark.parametrize("multipop", [8, 32])
def test_multipop_equivalence_blank_dominant(espnet_weights, multipop):
    """Heavy blank dominance (the realistic serving regime) makes multipop
    accept full speculative windows — the acceptance bookkeeping must still
    be pop-for-pop exact vs the serial loop. Random-logit cases are covered
    by the oracle tests; this pins the high-acceptance path."""
    sd, jp, rnnt_cfg = espnet_weights
    jp2 = jax.tree.map(lambda x: x, jp)
    jb = dict(jp2["joint"])
    out = dict(jb["out"])
    out["b"] = out["b"].at[0].add(6.0)  # on top of the fixture's +2
    jb["out"] = out
    jp2 = dict(jp2)
    jp2["joint"] = jb
    rng = np.random.default_rng(21)
    t = 30
    b = 8
    enc = rng.standard_normal((b, t, rnnt_cfg.enc_dim)).astype(np.float32)
    lens = jnp.asarray([30, 30, 24, 17, 9, 30, 1, 22], jnp.int32)
    base = GravesBeamConfig(beam_size=20)
    r1 = graves_beam_decode(
        jp2["predictor"], jp2["joint"], jnp.asarray(enc), lens, rnnt_cfg, base
    )
    from dataclasses import replace

    r2 = graves_beam_decode(
        jp2["predictor"], jp2["joint"], jnp.asarray(enc), lens, rnnt_cfg,
        replace(base, multipop=multipop),
    )
    t1, f1, c1, s1, sat1 = [np.asarray(x) for x in r1]
    t2, f2, c2, s2, sat2 = [np.asarray(x) for x in r2]
    assert not sat1.any() and not sat2.any()
    assert (c1 == c2).all()
    for i in range(b):
        c = int(c1[i])
        assert t1[i, :c].tolist() == t2[i, :c].tolist(), i
        assert f1[i, :c].tolist() == f2[i, :c].tolist(), i
    np.testing.assert_allclose(s1, s2, atol=1e-4)


def test_zero_length_and_padding_invariance(espnet_weights):
    sd, jp, rnnt_cfg = espnet_weights
    rng = np.random.default_rng(5)
    enc = rng.standard_normal((3, 12, rnnt_cfg.enc_dim)).astype(np.float32)
    lens = jnp.array([12, 0, 8])
    cfg = GravesBeamConfig(beam_size=8)
    bt, _, bc, _, _ = graves_beam_decode(
        jp["predictor"], jp["joint"], jnp.asarray(enc), lens, rnnt_cfg, cfg
    )
    assert int(bc[1]) == 0
    # contents of the zero-length row must not influence the others
    enc2 = np.array(enc)
    enc2[1] = 33.0
    bt2, _, bc2, _, _ = graves_beam_decode(
        jp["predictor"], jp["joint"], jnp.asarray(enc2), lens, rnnt_cfg, cfg
    )
    for i in (0, 2):
        c = int(bc[i])
        assert int(bc2[i]) == c
        assert np.asarray(bt)[i, :c].tolist() == np.asarray(bt2)[i, :c].tolist()


def test_frames_monotone_and_bounded(espnet_weights):
    sd, jp, rnnt_cfg = espnet_weights
    rng = np.random.default_rng(9)
    enc = rng.standard_normal((2, 16, rnnt_cfg.enc_dim)).astype(np.float32)
    lens = jnp.array([16, 11])
    bt, bf, bc, bs, _ = graves_beam_decode(
        jp["predictor"], jp["joint"], jnp.asarray(enc), lens, rnnt_cfg,
        GravesBeamConfig(beam_size=6),
    )
    for i, L in enumerate([16, 11]):
        c = int(bc[i])
        fr = np.asarray(bf)[i, :c].tolist()
        assert fr == sorted(fr)
        if c:
            assert max(fr) < L
    assert np.isfinite(np.asarray(bs)).all()
