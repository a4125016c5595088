"""Segmented greedy RNN-T (continuous-batching substrate) vs the full decode.

The segmented API (greedy_state_init / greedy_segment / greedy_finalize) must
be bit-identical per lane to a dedicated rnnt_greedy_decode of the same
utterance — the greedy step body has no cross-lane ops, so lane trajectories
are element-local. Covers both predictor kinds (nemo LSTM: the lane state
stores (h, c) batch-leading for mesh sharding; k2 stateless 2-token context),
lane recycling, and the data-dependent ``done`` flag. Reference behavior
being scaled: the per-call greedy decodes reached through
pkg/k2-asr/src/huggingface.py:73-83 and nemo's decoding='greedy' option.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.decoding.rnnt_greedy import (
    GreedyDecodeConfig,
    greedy_finalize,
    greedy_segment,
    greedy_state_init,
    greedy_step_bound,
    rnnt_greedy_decode,
)
from reazonspeech_tpu.models.rnnt import (
    RNNTConfig,
    init_joint,
    init_predictor,
    joint_precompute_enc,
)

# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow


def _tiny(predictor_kind="lstm", seed=0):
    kw = {"predictor_kind": predictor_kind}
    if predictor_kind == "stateless":
        kw["context_size"] = 2
    rnnt_cfg = RNNTConfig(
        vocab_size=30, enc_dim=16, pred_hidden=24, joint_hidden=32,
        compute_dtype="float32", **kw,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    pred = init_predictor(k1, rnnt_cfg)
    joint = init_joint(k2, rnnt_cfg)
    out = dict(joint["out"])
    out["b"] = out["b"].at[rnnt_cfg.blank_id].add(2.0)  # sparse emissions
    joint = dict(joint)
    joint["out"] = out
    return pred, joint, rnnt_cfg


@pytest.fixture(scope="module", params=["lstm", "stateless"])
def tiny_rnnt(request):
    return _tiny(request.param)


def _run_segments(pred, joint, ring, lane_len, state, rnnt_cfg, cfg, n_steps):
    """Drive segments until every lane reports done; no lane swaps."""
    reset = jnp.zeros((ring.shape[0],), bool)
    for _ in range(256):
        state, done = greedy_segment(
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
    enc = rng.standard_normal((3, t, rnnt_cfg.enc_dim)).astype(np.float32)
    lens = jnp.asarray([18, 7, 12], jnp.int32)
    cfg = GreedyDecodeConfig(max_tokens=t)  # full decode's default u_max = T

    ft, ff, fc = rnnt_greedy_decode(
        pred, joint, jnp.asarray(enc), lens, rnnt_cfg, cfg
    )

    ring = joint_precompute_enc(joint, jnp.asarray(enc), rnnt_cfg)
    state = greedy_state_init(pred, 3, rnnt_cfg, cfg)
    state = _run_segments(pred, joint, ring, lens, state, rnnt_cfg, cfg,
                          n_steps)
    st, sf_, sc = greedy_finalize(state, lens)

    assert np.array_equal(np.asarray(fc), np.asarray(sc))
    for i in range(3):
        c = int(fc[i])
        assert np.asarray(ft)[i, :c].tolist() == np.asarray(st)[i, :c].tolist()
        assert np.asarray(ff)[i, :c].tolist() == np.asarray(sf_)[i, :c].tolist()


@pytest.mark.parametrize("w", [2, 4])
def test_segment_respects_frame_window(w):
    """Blank-run skipping (frame_window > 1) composes with segmentation."""
    pred, joint, rnnt_cfg = _tiny("lstm", seed=2)
    rng = np.random.default_rng(5)
    t = 20
    enc = rng.standard_normal((2, t, rnnt_cfg.enc_dim)).astype(np.float32)
    lens = jnp.asarray([20, 11], jnp.int32)
    cfg = GreedyDecodeConfig(max_tokens=t, frame_window=w)

    ft, ff, fc = rnnt_greedy_decode(
        pred, joint, jnp.asarray(enc), lens, rnnt_cfg, cfg)
    ring = joint_precompute_enc(joint, jnp.asarray(enc), rnnt_cfg)
    state = greedy_state_init(pred, 2, rnnt_cfg, cfg)
    state = _run_segments(pred, joint, ring, lens, state, rnnt_cfg, cfg, 3)
    st, sf_, sc = greedy_finalize(state, lens)
    assert np.array_equal(np.asarray(fc), np.asarray(sc))
    for i in range(2):
        c = int(fc[i])
        assert np.asarray(ft)[i, :c].tolist() == np.asarray(st)[i, :c].tolist()
        assert np.asarray(ff)[i, :c].tolist() == np.asarray(sf_)[i, :c].tolist()


def test_done_precedes_step_bound(tiny_rnnt):
    """With blank-biased weights most iterations advance a frame without
    emitting, so lanes finish well before the lane_len + emission_cap bound;
    ``done`` must surface that early (the scheduler's recycling win)."""
    pred, joint, rnnt_cfg = tiny_rnnt
    rng = np.random.default_rng(3)
    t = 20
    enc = rng.standard_normal((2, t, rnnt_cfg.enc_dim)).astype(np.float32)
    lens = jnp.asarray([20, 20], jnp.int32)
    cfg = GreedyDecodeConfig(max_tokens=2 * t)

    ring = joint_precompute_enc(joint, jnp.asarray(enc), rnnt_cfg)
    state = greedy_state_init(pred, 2, rnnt_cfg, cfg)
    reset = jnp.zeros((2,), bool)
    n_steps = 5
    steps_when_done = None
    for seg in range(1, 64):
        state, done = greedy_segment(
            pred, joint, ring, lens, reset, state, rnnt_cfg, cfg, n_steps)
        if bool(jnp.all(done)):
            steps_when_done = seg * n_steps
            break
    assert steps_when_done is not None
    bound = greedy_step_bound(20, cfg)
    assert steps_when_done < bound, (steps_when_done, bound)


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
    cfg = GreedyDecodeConfig(max_tokens=t_buf)

    # dedicated single-utterance decodes (the ground truth)
    want = []
    for enc in reqs:
        tt, tf, tc = rnnt_greedy_decode(
            pred, joint,
            jnp.asarray(enc)[None],
            jnp.asarray([len(enc)], jnp.int32),
            rnnt_cfg, cfg,
        )
        c = int(tc[0])
        want.append((np.asarray(tt)[0, :c].tolist(),
                     np.asarray(tf)[0, :c].tolist()))

    # continuous: 2 lanes, segment = 4 steps, swap on device-reported done
    b = 2
    ring = jnp.zeros((b, t_buf, joint["enc"]["w"].shape[-1]), jnp.float32)
    lane_len = np.zeros((b,), np.int32)
    lane_req = [-1, -1]
    state = greedy_state_init(pred, b, rnnt_cfg, cfg)
    done = np.ones((b,), bool)
    next_req = 0
    got = [None] * len(reqs)
    for _ in range(400):
        reset = np.zeros((b,), bool)
        for lane in range(b):
            if lane_req[lane] >= 0 and done[lane]:
                tt, tf, tc = greedy_finalize(state, jnp.asarray(lane_len))
                c = int(tc[lane])
                got[lane_req[lane]] = (
                    np.asarray(tt)[lane, :c].tolist(),
                    np.asarray(tf)[lane, :c].tolist())
                lane_req[lane] = -1
                lane_len = lane_len.copy()
                lane_len[lane] = 0
            if lane_req[lane] < 0 and next_req < len(reqs):
                enc_proj = joint_precompute_enc(
                    joint, jnp.asarray(reqs[next_req])[None], rnnt_cfg)[0]
                pad = jnp.zeros((t_buf - enc_proj.shape[0],
                                 enc_proj.shape[1]), jnp.float32)
                ring = ring.at[lane].set(
                    jnp.concatenate([enc_proj, pad], axis=0))
                lane_len = lane_len.copy()
                lane_len[lane] = len(reqs[next_req])
                lane_req[lane] = next_req
                reset[lane] = True
                next_req += 1
        if next_req >= len(reqs) and all(r < 0 for r in lane_req):
            break
        state, done_dev = greedy_segment(
            pred, joint, ring, jnp.asarray(lane_len), jnp.asarray(reset),
            state, rnnt_cfg, cfg, 4,
        )
        done = np.asarray(done_dev)
    assert all(g is not None for g in got)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g[0] == w[0], i
        assert g[1] == w[1], i


def test_state_init_requires_max_tokens():
    pred, _, rnnt_cfg = _tiny("lstm")
    with pytest.raises(ValueError):
        greedy_state_init(pred, 2, rnnt_cfg, GreedyDecodeConfig())
