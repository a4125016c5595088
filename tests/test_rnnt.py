import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.decoding.rnnt_greedy import GreedyDecodeConfig, rnnt_greedy_decode
from reazonspeech_tpu.models.rnnt import (
    RNNTConfig,
    init_joint,
    init_predictor,
    joint_full,
    joint_step,
    predictor_sequence,
    predictor_step,
    predictor_zero_state,
)

# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny():
    cfg = RNNTConfig.tiny(compute_dtype="float32")
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return cfg, init_predictor(k1, cfg), init_joint(k2, cfg)


def test_predictor_step_and_sequence_agree(tiny):
    cfg, pred, _ = tiny
    b, u = 2, 5
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (b, u)), jnp.int32
    )
    gs = predictor_sequence(pred, tokens, cfg)  # [B, U+1, H]
    assert gs.shape == (b, u + 1, cfg.pred_hidden)

    # replicate with manual stepping
    state = predictor_zero_state(b, cfg)
    outs = []
    g, state = predictor_step(pred, jnp.full((b,), cfg.blank_id, jnp.int32), state, cfg)
    outs.append(g)
    for i in range(u):
        g, state = predictor_step(pred, tokens[:, i], state, cfg)
        outs.append(g)
    manual = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(manual), atol=1e-5)


def test_blank_embeds_to_zero(tiny):
    cfg, pred, _ = tiny
    state = predictor_zero_state(1, cfg)
    g_blank, _ = predictor_step(pred, jnp.array([cfg.blank_id]), state, cfg)
    # stepping with blank == stepping with zero input; differs from a real token
    g_tok, _ = predictor_step(pred, jnp.array([0]), state, cfg)
    assert not np.allclose(np.asarray(g_blank), np.asarray(g_tok))


def test_joint_full_matches_step(tiny):
    cfg, pred, joint = tiny
    b, t, u1 = 2, 3, 4
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal((b, t, cfg.enc_dim)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, u1, cfg.pred_hidden)), jnp.float32)
    full = joint_full(joint, enc, g, cfg)
    assert full.shape == (b, t, u1, cfg.num_classes)
    one = joint_step(joint, enc[:, 1], g[:, 2], cfg)
    np.testing.assert_allclose(np.asarray(full[:, 1, 2]), np.asarray(one), atol=1e-5)


def test_greedy_decode_scripted():
    """Rig the joint so its logits depend only on the encoder frame, with a
    known emission plan; the decode must recover exactly those (token, frame)
    pairs."""
    cfg = RNNTConfig.tiny(compute_dtype="float32", joint_hidden=80, enc_dim=80)
    pred = init_predictor(jax.random.PRNGKey(0), cfg)
    joint = {
        "enc": {"w": jnp.eye(cfg.enc_dim, cfg.joint_hidden), "b": jnp.zeros(cfg.joint_hidden)},
        "pred": {
            "w": jnp.zeros((cfg.pred_hidden, cfg.joint_hidden)),
            "b": jnp.zeros(cfg.joint_hidden),
        },
        "out": {"w": jnp.eye(cfg.joint_hidden, cfg.num_classes), "b": jnp.zeros(cfg.num_classes)},
    }
    # plan: frame 0 -> token 5, frame 1 -> blank, frame 2 -> token 7, rest blank
    t = 6
    enc = np.zeros((1, t, cfg.enc_dim), np.float32)
    plan = {0: 5, 2: 7, 4: 11}
    for f in range(t):
        tok = plan.get(f, cfg.blank_id)
        enc[0, f, tok] = 5.0
    # NOTE: with enc-only logits the same token would repeat forever at its
    # frame; the max_symbols_per_step guard must force frame advance.
    tokens, frames, counts = rnnt_greedy_decode(
        pred,
        joint,
        jnp.asarray(enc),
        jnp.array([t]),
        cfg,
        GreedyDecodeConfig(max_symbols_per_step=1),
    )
    c = int(counts[0])
    got = list(zip(tokens[0, :c].tolist(), frames[0, :c].tolist()))
    assert got == [(5, 0), (7, 2), (11, 4)]


def test_greedy_decode_respects_lengths():
    cfg = RNNTConfig.tiny(compute_dtype="float32", joint_hidden=80, enc_dim=80)
    pred = init_predictor(jax.random.PRNGKey(0), cfg)
    joint = {
        "enc": {"w": jnp.eye(cfg.enc_dim, cfg.joint_hidden), "b": jnp.zeros(cfg.joint_hidden)},
        "pred": {
            "w": jnp.zeros((cfg.pred_hidden, cfg.joint_hidden)),
            "b": jnp.zeros(cfg.joint_hidden),
        },
        "out": {"w": jnp.eye(cfg.joint_hidden, cfg.num_classes), "b": jnp.zeros(cfg.num_classes)},
    }
    t = 8
    enc = np.zeros((2, t, cfg.enc_dim), np.float32)
    enc[:, :, 3] = 5.0  # token 3 at every frame for both elements
    tokens, frames, counts = rnnt_greedy_decode(
        pred,
        joint,
        jnp.asarray(enc),
        jnp.array([8, 3]),
        cfg,
        GreedyDecodeConfig(max_symbols_per_step=1),
    )
    assert int(counts[0]) == 8
    assert int(counts[1]) == 3  # emissions stop at the valid length
    assert frames[1, :3].tolist() == [0, 1, 2]


def test_greedy_decode_random_model_finite():
    cfg = RNNTConfig.tiny(compute_dtype="float32")
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    pred, joint = init_predictor(k1, cfg), init_joint(k2, cfg)
    enc = jnp.asarray(
        np.random.default_rng(0).standard_normal((3, 20, cfg.enc_dim)), jnp.float32
    )
    tokens, frames, counts = rnnt_greedy_decode(
        pred, joint, enc, jnp.array([20, 10, 1]), cfg
    )
    assert tokens.shape == frames.shape == (3, 20)
    for i, c in enumerate(np.asarray(counts)):
        assert 0 <= c <= 20
        # frames monotonically nondecreasing within valid emissions
        fr = frames[i, :c].tolist()
        assert fr == sorted(fr)


@pytest.mark.parametrize("kind", ["lstm", "stateless"])
def test_greedy_matches_python_simulation(kind):
    """The while_loop greedy decode must match a straightforward per-element
    Python simulation of label-looping greedy search."""
    if kind == "stateless":
        cfg = RNNTConfig(
            vocab_size=24, enc_dim=16, pred_hidden=12, joint_hidden=12,
            compute_dtype="float32", predictor_kind="stateless",
        )
    else:
        cfg = RNNTConfig(
            vocab_size=24, enc_dim=16, pred_hidden=12, joint_hidden=12,
            compute_dtype="float32",
        )
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    pred, joint = init_predictor(k1, cfg), init_joint(k2, cfg)
    rng = np.random.default_rng(11)
    b, t = 3, 9
    enc = jnp.asarray(rng.standard_normal((b, t, cfg.enc_dim)), jnp.float32)
    lens = [9, 5, 1]
    max_symbols = 4

    def simulate(i):
        state = predictor_zero_state(1, cfg)
        g, state = predictor_step(
            pred, jnp.array([cfg.blank_id], jnp.int32), state, cfg
        )
        out = []
        f = 0
        syms = 0
        while f < lens[i] and len(out) < t:
            from reazonspeech_tpu.models.rnnt import joint_step

            logits = joint_step(joint, enc[i : i + 1, f], g, cfg)
            tok = int(jnp.argmax(logits, -1)[0])
            if tok == cfg.blank_id or syms >= max_symbols:
                f += 1
                syms = 0
            else:
                out.append((tok, f))
                syms += 1
                g, state = predictor_step(pred, jnp.array([tok], jnp.int32), state, cfg)
        return out

    tokens, frames, counts = rnnt_greedy_decode(
        pred, joint, enc, jnp.asarray(lens), cfg,
        GreedyDecodeConfig(max_symbols_per_step=max_symbols),
    )
    for i in range(b):
        want = simulate(i)
        c = int(counts[i])
        got = list(zip(tokens[i, :c].tolist(), frames[i, :c].tolist()))
        assert got == want, (i, got, want)


def test_greedy_frame_window_bit_exact():
    """frame_window>1 (blank-run skipping) must produce IDENTICAL emissions
    to the sequential decode for arbitrary inputs."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from reazonspeech_tpu.decoding.rnnt_greedy import (
        GreedyDecodeConfig,
        rnnt_greedy_decode,
    )
    from reazonspeech_tpu.models.rnnt import RNNTConfig, init_joint, init_predictor

    for kind, blankpos in (("lstm", "auto"), ("stateless", "auto")):
        cfg = RNNTConfig(
            vocab_size=24, enc_dim=16, pred_hidden=12, joint_hidden=12,
            predictor_kind=kind, blank_position=blankpos,
            compute_dtype="float32", context_size=2,
        )
        key = jax.random.PRNGKey(3)
        k1, k2, k3 = jax.random.split(key, 3)
        pred = init_predictor(k1, cfg)
        joint = init_joint(k2, cfg)
        # bias the blank logit up so realistic blank runs appear
        joint["out"]["b"] = joint["out"]["b"].at[cfg.blank_id].add(2.0)
        enc = jax.random.normal(k3, (3, 40, 16), jnp.float32)
        lens = jnp.array([40, 23, 1])

        base = rnnt_greedy_decode(pred, joint, enc, lens, cfg,
                                  GreedyDecodeConfig(frame_window=1))
        for w in (2, 5, 8, 64):
            got = rnnt_greedy_decode(pred, joint, enc, lens, cfg,
                                     GreedyDecodeConfig(frame_window=w))
            for a, b in zip(base, got):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), (kind, w)
