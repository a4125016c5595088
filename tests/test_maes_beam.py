"""mAES (modified Adaptive Expansion Search) transducer beam vs its serial
oracle, plus fixed-shape invariances and the segmented API."""

import os
import sys
import tempfile

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from reazonspeech_tpu.decoding.transducer_maes import (
    MAESBeamConfig,
    maes_beam_decode,
    maes_beam_segment,
    maes_finalize,
    maes_state_init,
)
from reazonspeech_tpu.models.rnnt import RNNTConfig

# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def espnet_weights():
    """Fixture espnet-zoo checkpoint shared by torch-sd and JAX worlds,
    with a mildly blank-biased joint so emissions are sparse (realistic)."""
    import glob

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
    "beam,nstep,gamma,prefix_alpha,seed",
    [(4, 2, 2.3, 1, 3), (8, 2, 2.3, 1, 11), (8, 3, 4.0, 1, 12),
     (8, 1, 2.3, 1, 7), (8, 2, 2.3, 0, 11)],
)
def test_matches_serial_oracle(espnet_weights, beam, nstep, gamma,
                               prefix_alpha, seed):
    """Batched fixed-shape mAES == the serial oracle of the same bounded
    algorithm, token-and-frame exact."""
    from torch_reference import espnet_maes_beam_reference

    sd, jp, rnnt_cfg = espnet_weights
    rng = np.random.default_rng(seed)
    t = 24
    enc = rng.standard_normal((3, t, rnnt_cfg.enc_dim)).astype(np.float32)
    lens = [24, 17, 9]
    cfg = MAESBeamConfig(beam_size=beam, nstep=nstep, expansion_gamma=gamma,
                         prefix_alpha=prefix_alpha)
    bt, bf, bc, bs = maes_beam_decode(
        jp["predictor"], jp["joint"], jnp.asarray(enc), jnp.asarray(lens),
        rnnt_cfg, cfg,
    )
    bt, bf, bc, bs = [np.asarray(x) for x in (bt, bf, bc, bs)]
    for i, L in enumerate(lens):
        rt, rf, rs = espnet_maes_beam_reference(
            sd, torch.from_numpy(enc[i, :L]), rnnt_cfg.vocab_size,
            beam_size=beam, nstep=nstep, expansion_gamma=gamma,
            prefix_alpha=prefix_alpha, max_tokens=t,
            joint_activation="tanh",
        )
        c = int(bc[i])
        assert bt[i, :c].tolist() == rt, (beam, nstep, seed, i)
        assert bf[i, :c].tolist() == rf, (beam, nstep, seed, i)
        np.testing.assert_allclose(float(bs[i]), rs, atol=1e-3)


def test_blank_dominant_matches_oracle(espnet_weights):
    """Heavier blank bias (the realistic serving regime: most frames emit
    nothing) must stay oracle-exact too."""
    from torch_reference import espnet_maes_beam_reference

    sd2 = dict(espnet_weights[0])
    sd2["joint_network.lin_out.bias"] = sd2["joint_network.lin_out.bias"].clone()
    sd2["joint_network.lin_out.bias"][0] += 4.0
    _, jp, rnnt_cfg = espnet_weights
    jb = dict(jp["joint"])
    out = dict(jb["out"])
    out["b"] = out["b"].at[0].add(4.0)
    jb["out"] = out
    jp2 = dict(jp)
    jp2["joint"] = jb

    rng = np.random.default_rng(21)
    t = 30
    enc = rng.standard_normal((2, t, rnnt_cfg.enc_dim)).astype(np.float32)
    lens = [30, 22]
    cfg = MAESBeamConfig(beam_size=8)
    bt, bf, bc, bs = maes_beam_decode(
        jp2["predictor"], jp2["joint"], jnp.asarray(enc), jnp.asarray(lens),
        rnnt_cfg, cfg,
    )
    bt, bf, bc = [np.asarray(x) for x in (bt, bf, bc)]
    for i, L in enumerate(lens):
        rt, rf, rs = espnet_maes_beam_reference(
            sd2, torch.from_numpy(enc[i, :L]), rnnt_cfg.vocab_size,
            beam_size=8, max_tokens=t, joint_activation="tanh",
        )
        c = int(bc[i])
        assert bt[i, :c].tolist() == rt, i
        assert bf[i, :c].tolist() == rf, i


def test_zero_length_and_padding_invariance(espnet_weights):
    sd, jp, rnnt_cfg = espnet_weights
    rng = np.random.default_rng(5)
    enc = rng.standard_normal((3, 12, rnnt_cfg.enc_dim)).astype(np.float32)
    lens = jnp.array([12, 0, 8])
    cfg = MAESBeamConfig(beam_size=6)
    bt, _, bc, _ = maes_beam_decode(
        jp["predictor"], jp["joint"], jnp.asarray(enc), lens, rnnt_cfg, cfg
    )
    assert int(bc[1]) == 0
    enc2 = np.array(enc)
    enc2[1] = 33.0
    bt2, _, bc2, _ = maes_beam_decode(
        jp["predictor"], jp["joint"], jnp.asarray(enc2), lens, rnnt_cfg, cfg
    )
    for i in (0, 2):
        c = int(bc[i])
        assert int(bc2[i]) == c
        assert np.asarray(bt)[i, :c].tolist() == np.asarray(bt2)[i, :c].tolist()


def test_segmented_matches_whole(espnet_weights):
    """init → segments → finalize must reproduce the one-shot decode
    bit-exactly (the continuous-batching contract)."""
    from reazonspeech_tpu.models.rnnt import joint_precompute_enc

    sd, jp, rnnt_cfg = espnet_weights
    rng = np.random.default_rng(13)
    b, t = 3, 20
    enc = rng.standard_normal((b, t, rnnt_cfg.enc_dim)).astype(np.float32)
    lens = jnp.asarray([20, 13, 7], jnp.int32)
    cfg = MAESBeamConfig(beam_size=6, max_tokens=t)
    whole = maes_beam_decode(
        jp["predictor"], jp["joint"], jnp.asarray(enc), lens, rnnt_cfg, cfg)

    enc_proj = joint_precompute_enc(jp["joint"], jnp.asarray(enc), rnnt_cfg)
    state = maes_state_init(jp["predictor"], b, rnnt_cfg, cfg)
    no_reset = jnp.zeros((b,), bool)
    for _ in range(4):  # 4 segments x 6 frames >= 20
        state = maes_beam_segment(
            jp["predictor"], jp["joint"], enc_proj, lens, no_reset, state,
            rnnt_cfg, cfg, n_frames=6)
    seg = maes_finalize(state, lens, rnnt_cfg, cfg)
    for a, c in zip(whole, seg):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_frames_monotone_and_bounded(espnet_weights):
    sd, jp, rnnt_cfg = espnet_weights
    rng = np.random.default_rng(9)
    enc = rng.standard_normal((2, 16, rnnt_cfg.enc_dim)).astype(np.float32)
    lens = jnp.array([16, 11])
    bt, bf, bc, bs = maes_beam_decode(
        jp["predictor"], jp["joint"], jnp.asarray(enc), lens, rnnt_cfg,
        MAESBeamConfig(beam_size=6),
    )
    for i, L in enumerate([16, 11]):
        c = int(bc[i])
        fr = np.asarray(bf)[i, :c].tolist()
        assert fr == sorted(fr)
        if c:
            assert max(fr) < L
    assert np.isfinite(np.asarray(bs)).all()
