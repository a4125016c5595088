"""Segmented Graves beam (continuous-batching substrate) vs the full decode.

The segmented API (graves_state_init / graves_beam_segment / graves_finalize)
must be bit-identical per lane to a dedicated graves_beam_decode of the same
utterance — pops are element-local and the survivor slice is the complete
cross-frame state. These tests pin that, including lane recycling (a finished
lane is reset and reused for a new request mid-flight), which is what the
continuous-batching server (serving/continuous.py) builds on. Reference
behavior being scaled: the per-utterance serial decode loop at
pkg/espnet-asr/src/transcribe.py:59-78."""

from dataclasses import replace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.decoding.transducer_graves import (
    GravesBeamConfig,
    graves_beam_decode,
    graves_beam_segment,
    graves_finalize,
    graves_state_init,
)
from reazonspeech_tpu.models.rnnt import (
    RNNTConfig,
    init_joint,
    init_predictor,
    joint_precompute_enc,
)

# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_rnnt():
    """espnet-convention tiny transducer with a blank-biased joint."""
    rnnt_cfg = RNNTConfig(
        vocab_size=30, enc_dim=16, pred_hidden=24, joint_hidden=32,
        joint_activation="tanh", blank_position="first",
        compute_dtype="float32",
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    pred = init_predictor(k1, rnnt_cfg)
    joint = init_joint(k2, rnnt_cfg)
    out = dict(joint["out"])
    out["b"] = out["b"].at[0].add(2.0)  # sparse (realistic) emissions
    joint = dict(joint)
    joint["out"] = out
    return pred, joint, rnnt_cfg


def _run_segments(pred, joint, ring, lane_len, state, rnnt_cfg, cfg, n_frames):
    """Drive segments until every lane is finished; no lane swaps."""
    reset = jnp.zeros((ring.shape[0],), bool)
    for _ in range(64):  # bound: t_buf / n_frames segments suffice
        state = graves_beam_segment(
            pred, joint, ring, lane_len, reset, state, rnnt_cfg, cfg, n_frames
        )
        if bool(jnp.all(state.fidx >= lane_len)):
            return state
    raise AssertionError("segments did not converge")


@pytest.mark.parametrize("multipop,n_frames", [(1, 5), (1, 1), (4, 5)])
def test_segment_equals_full_decode(tiny_rnnt, multipop, n_frames):
    pred, joint, rnnt_cfg = tiny_rnnt
    rng = np.random.default_rng(7)
    t = 18
    enc = rng.standard_normal((3, t, rnnt_cfg.enc_dim)).astype(np.float32)
    lens = jnp.asarray([18, 7, 12], jnp.int32)
    cfg = GravesBeamConfig(beam_size=8, max_tokens=t, multipop=multipop)

    ft, ff, fc, fs, fsat = graves_beam_decode(
        pred, joint, jnp.asarray(enc), lens, rnnt_cfg, cfg
    )

    ring = joint_precompute_enc(joint, jnp.asarray(enc), rnnt_cfg)
    state = graves_state_init(3, rnnt_cfg, cfg)
    state = _run_segments(pred, joint, ring, lens, state, rnnt_cfg, cfg,
                          n_frames)
    st, sf_, sc, ss, ssat = graves_finalize(state, lens, rnnt_cfg, cfg)

    assert np.array_equal(np.asarray(fc), np.asarray(sc))
    for i in range(3):
        c = int(fc[i])
        assert np.asarray(ft)[i, :c].tolist() == np.asarray(st)[i, :c].tolist()
        assert np.asarray(ff)[i, :c].tolist() == np.asarray(sf_)[i, :c].tolist()
    np.testing.assert_array_equal(np.asarray(fs), np.asarray(ss))
    np.testing.assert_array_equal(np.asarray(fsat), np.asarray(ssat))


def test_lane_recycling_matches_dedicated_decode(tiny_rnnt):
    """2 lanes serve 5 staggered requests; every request's tokens must match
    a dedicated full decode — recycled lanes carry nothing across resets."""
    pred, joint, rnnt_cfg = tiny_rnnt
    rng = np.random.default_rng(11)
    t_buf = 16
    req_lens = [14, 6, 9, 11, 3]
    reqs = [
        rng.standard_normal((L, rnnt_cfg.enc_dim)).astype(np.float32)
        for L in req_lens
    ]
    cfg = GravesBeamConfig(beam_size=6, max_tokens=t_buf)

    # dedicated single-utterance decodes (the ground truth)
    want = []
    for enc in reqs:
        tt, tf, tc, ts, _ = graves_beam_decode(
            pred, joint,
            jnp.asarray(enc)[None],
            jnp.asarray([len(enc)], jnp.int32),
            rnnt_cfg, cfg,
        )
        c = int(tc[0])
        want.append((np.asarray(tt)[0, :c].tolist(),
                     np.asarray(tf)[0, :c].tolist(), float(ts[0])))

    # continuous: 2 lanes, segment = 4 frames, swap on completion
    b = 2
    ring = jnp.zeros((b, t_buf, joint["enc"]["w"].shape[-1]), jnp.float32)
    lane_len = np.zeros((b,), np.int32)
    lane_req = [-1, -1]
    state = graves_state_init(b, rnnt_cfg, cfg)
    next_req = 0
    got = [None] * len(reqs)
    for _ in range(200):
        reset = np.zeros((b,), bool)
        fidx = np.asarray(state.fidx)
        for lane in range(b):
            if lane_req[lane] >= 0 and fidx[lane] >= lane_len[lane]:
                # lane finished: extract, free
                tt, tf, tc, ts, _ = graves_finalize(
                    state, jnp.asarray(lane_len), rnnt_cfg, cfg)
                c = int(tc[lane])
                got[lane_req[lane]] = (
                    np.asarray(tt)[lane, :c].tolist(),
                    np.asarray(tf)[lane, :c].tolist(), float(ts[lane]))
                lane_req[lane] = -1
                lane_len[lane] = 0
            if lane_req[lane] < 0 and next_req < len(reqs):
                # swap the next request in
                enc_proj = joint_precompute_enc(
                    joint, jnp.asarray(reqs[next_req])[None], rnnt_cfg)[0]
                pad = jnp.zeros((t_buf - enc_proj.shape[0],
                                 enc_proj.shape[1]), jnp.float32)
                ring = ring.at[lane].set(
                    jnp.concatenate([enc_proj, pad], axis=0))
                lane_len[lane] = len(reqs[next_req])
                lane_req[lane] = next_req
                reset[lane] = True
                next_req += 1
        if next_req >= len(reqs) and all(r < 0 for r in lane_req):
            break
        state = graves_beam_segment(
            pred, joint, ring, jnp.asarray(lane_len), jnp.asarray(reset),
            state, rnnt_cfg, cfg, 4,
        )
    assert all(g is not None for g in got)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g[0] == w[0], i
        assert g[1] == w[1], i
        np.testing.assert_allclose(g[2], w[2], atol=1e-5)


def test_state_init_requires_max_tokens(tiny_rnnt):
    _, _, rnnt_cfg = tiny_rnnt
    with pytest.raises(ValueError):
        graves_state_init(2, rnnt_cfg, GravesBeamConfig(beam_size=4))
