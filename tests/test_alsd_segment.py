"""Segmented ALSD beam (continuous-batching substrate) vs the full decode.

The segmented API (alsd_state_init / alsd_segment / alsd_finalize) must be
bit-identical per lane to a dedicated rnnt_beam_decode of the same utterance
— the ALSD step body has no cross-lane ops, so lane trajectories are
element-local. These tests pin that, including lane recycling (a finished
lane is reset and reused for a new request mid-flight) and the data-dependent
``done`` flag (an ALSD lane can finish well before its step bound when every
hypothesis consumes its last frame). Reference behavior being scaled: NeMo's
per-call ALSD decode reached through pkg/nemo-asr/src/transcribe.py:48-53.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.decoding.rnnt_beam import (
    BeamDecodeConfig,
    alsd_finalize,
    alsd_segment,
    alsd_state_init,
    alsd_step_bound,
    rnnt_beam_decode,
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
    """nemo-convention tiny transducer with a blank-biased joint."""
    rnnt_cfg = RNNTConfig(
        vocab_size=30, enc_dim=16, pred_hidden=24, joint_hidden=32,
        compute_dtype="float32",
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    pred = init_predictor(k1, rnnt_cfg)
    joint = init_joint(k2, rnnt_cfg)
    out = dict(joint["out"])
    out["b"] = out["b"].at[rnnt_cfg.blank_id].add(2.0)  # sparse emissions
    joint = dict(joint)
    joint["out"] = out
    return pred, joint, rnnt_cfg


def _run_segments(pred, joint, ring, lane_len, state, rnnt_cfg, cfg, n_steps):
    """Drive segments until every lane reports done; no lane swaps."""
    reset = jnp.zeros((ring.shape[0],), bool)
    for _ in range(128):
        state, done = alsd_segment(
            pred, joint, ring, lane_len, reset, state, rnnt_cfg, cfg, n_steps
        )
        if bool(jnp.all(done)):
            return state
    raise AssertionError("segments did not converge")


@pytest.mark.parametrize("n_steps", [1, 7, 64])
def test_segment_equals_full_decode(tiny_rnnt, n_steps):
    pred, joint, rnnt_cfg = tiny_rnnt
    rng = np.random.default_rng(7)
    t = 18
    u_buf = t + t  # the full decode's default emission buffer at ratio 1.0
    enc = rng.standard_normal((3, t, rnnt_cfg.enc_dim)).astype(np.float32)
    lens = jnp.asarray([18, 7, 12], jnp.int32)
    cfg = BeamDecodeConfig(beam_size=6, max_tokens=u_buf)

    ft, ff, fc, fs = rnnt_beam_decode(
        pred, joint, jnp.asarray(enc), lens, rnnt_cfg, cfg
    )

    ring = joint_precompute_enc(joint, jnp.asarray(enc), rnnt_cfg)
    state = alsd_state_init(pred, 3, rnnt_cfg, cfg)
    state = _run_segments(pred, joint, ring, lens, state, rnnt_cfg, cfg,
                          n_steps)
    st, sf_, sc, ss = alsd_finalize(state, lens, rnnt_cfg, cfg)

    assert np.array_equal(np.asarray(fc), np.asarray(sc))
    for i in range(3):
        c = int(fc[i])
        assert np.asarray(ft)[i, :c].tolist() == np.asarray(st)[i, :c].tolist()
        assert np.asarray(ff)[i, :c].tolist() == np.asarray(sf_)[i, :c].tolist()
    np.testing.assert_allclose(np.asarray(fs), np.asarray(ss), atol=1e-5)


def test_done_precedes_step_bound(tiny_rnnt):
    """``done`` fires as soon as the beam dies, which can precede the 2T
    step bound (with beam_size=1 and blank-biased weights the single
    hypothesis finalises right after consuming its last frame; wider beams
    keep laggard label paths alive to the budget — the scheduler handles
    both via the bound fallback)."""
    pred, joint, rnnt_cfg = tiny_rnnt
    rng = np.random.default_rng(3)
    t = 20
    enc = rng.standard_normal((2, t, rnnt_cfg.enc_dim)).astype(np.float32)
    lens = jnp.asarray([20, 20], jnp.int32)
    cfg = BeamDecodeConfig(beam_size=1, max_tokens=2 * t)

    ring = joint_precompute_enc(joint, jnp.asarray(enc), rnnt_cfg)
    state = alsd_state_init(pred, 2, rnnt_cfg, cfg)
    reset = jnp.zeros((2,), bool)
    n_steps = 5
    steps_when_done = None
    for seg in range(1, 32):
        state, done = alsd_segment(
            pred, joint, ring, lens, reset, state, rnnt_cfg, cfg, n_steps)
        if bool(jnp.all(done)):
            steps_when_done = seg * n_steps
            break
    assert steps_when_done is not None
    bound = alsd_step_bound(20, cfg)
    assert steps_when_done < bound, (steps_when_done, bound)
    # host clock mirror: step advances by exactly n_steps per segment while
    # any lane is active (both lanes share the pool clock here)
    assert int(state.step[0]) <= steps_when_done


def test_lane_recycling_matches_dedicated_decode(tiny_rnnt):
    """2 lanes serve 5 staggered requests; every request's tokens must match
    a dedicated full decode — recycled lanes carry nothing across resets."""
    pred, joint, rnnt_cfg = tiny_rnnt
    rng = np.random.default_rng(11)
    t_buf = 16
    u_buf = 2 * t_buf
    req_lens = [14, 6, 9, 11, 3]
    reqs = [
        rng.standard_normal((L, rnnt_cfg.enc_dim)).astype(np.float32)
        for L in req_lens
    ]
    cfg = BeamDecodeConfig(beam_size=5, max_tokens=u_buf)

    # dedicated single-utterance decodes (the ground truth)
    want = []
    for enc in reqs:
        tt, tf, tc, ts = rnnt_beam_decode(
            pred, joint,
            jnp.asarray(enc)[None],
            jnp.asarray([len(enc)], jnp.int32),
            rnnt_cfg, cfg,
        )
        c = int(tc[0])
        want.append((np.asarray(tt)[0, :c].tolist(),
                     np.asarray(tf)[0, :c].tolist(), float(ts[0])))

    # continuous: 2 lanes, segment = 4 steps, swap on device-reported done
    b = 2
    ring = jnp.zeros((b, t_buf, joint["enc"]["w"].shape[-1]), jnp.float32)
    lane_len = np.zeros((b,), np.int32)
    lane_req = [-1, -1]
    state = alsd_state_init(pred, b, rnnt_cfg, cfg)
    done = np.ones((b,), bool)
    next_req = 0
    got = [None] * len(reqs)
    for _ in range(400):
        reset = np.zeros((b,), bool)
        for lane in range(b):
            if lane_req[lane] >= 0 and done[lane]:
                # lane finished: extract, free
                tt, tf, tc, ts = alsd_finalize(
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
        state, done_dev = alsd_segment(
            pred, joint, ring, jnp.asarray(lane_len), jnp.asarray(reset),
            state, rnnt_cfg, cfg, 4,
        )
        done = np.asarray(done_dev)
    assert all(g is not None for g in got)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g[0] == w[0], i
        assert g[1] == w[1], i
        np.testing.assert_allclose(g[2], w[2], atol=1e-5)


def test_state_init_requires_max_tokens(tiny_rnnt):
    pred, _, rnnt_cfg = tiny_rnnt
    with pytest.raises(ValueError):
        alsd_state_init(pred, 2, rnnt_cfg, BeamDecodeConfig(beam_size=4))
