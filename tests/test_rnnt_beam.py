import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.decoding.rnnt_beam import BeamDecodeConfig, rnnt_beam_decode
from reazonspeech_tpu.decoding.rnnt_greedy import GreedyDecodeConfig, rnnt_greedy_decode
from reazonspeech_tpu.models.rnnt import RNNTConfig, init_joint, init_predictor


def make_model(kind="lstm", seed=1):
    cfg = RNNTConfig.tiny(compute_dtype="float32")
    if kind == "stateless":
        cfg = RNNTConfig(
            vocab_size=64, enc_dim=64, pred_hidden=32, joint_hidden=32,
            compute_dtype="float32", predictor_kind="stateless",
        )
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return cfg, init_predictor(k1, cfg), init_joint(k2, cfg)


@pytest.mark.parametrize("kind", ["lstm", "stateless"])
def test_beam1_matches_greedy(kind):
    """beam_size=1 is exactly greedy (same candidate set, same argmax)."""
    cfg, pred, joint = make_model(kind)
    enc = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 15, cfg.enc_dim)), jnp.float32
    )
    lens = jnp.array([15, 9])
    gt, gf, gc = rnnt_greedy_decode(
        pred, joint, enc, lens, cfg, GreedyDecodeConfig(max_symbols_per_step=10_000)
    )
    bt, bf, bc, _ = rnnt_beam_decode(
        pred, joint, enc, lens, cfg, BeamDecodeConfig(beam_size=1, expand_labels=1)
    )
    for i in range(2):
        c = int(gc[i])
        assert int(bc[i]) == c
        assert bt[i, :c].tolist() == gt[i, :c].tolist()
        assert bf[i, :c].tolist() == gf[i, :c].tolist()


def test_beam_scores_not_worse_than_greedy():
    """The best beam path's log-prob must be >= the greedy path's."""
    cfg, pred, joint = make_model()
    enc = jnp.asarray(
        np.random.default_rng(2).standard_normal((3, 12, cfg.enc_dim)), jnp.float32
    )
    lens = jnp.array([12, 12, 7])
    _, _, _, s1 = rnnt_beam_decode(
        pred, joint, enc, lens, cfg, BeamDecodeConfig(beam_size=1, expand_labels=1)
    )
    _, _, _, s8 = rnnt_beam_decode(
        pred, joint, enc, lens, cfg, BeamDecodeConfig(beam_size=8, expand_labels=8)
    )
    assert (np.asarray(s8) >= np.asarray(s1) - 1e-4).all()


def test_beam_structure():
    cfg, pred, joint = make_model()
    enc = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 10, cfg.enc_dim)), jnp.float32
    )
    lens = jnp.array([10, 4])
    tokens, frames, counts, scores = rnnt_beam_decode(
        pred, joint, enc, lens, cfg, BeamDecodeConfig(beam_size=4)
    )
    assert tokens.shape == frames.shape == (2, 10)
    for i in range(2):
        c = int(counts[i])
        fr = frames[i, :c].tolist()
        assert fr == sorted(fr)
        if c:
            assert max(fr) < int(lens[i])
    assert np.isfinite(np.asarray(scores)).all()


def test_beam_finds_optimal_alignment_bruteforce():
    """On a tiny problem, an exhaustive beam must return the max-probability
    alignment found by brute-force enumeration over all (blank|label)
    decision sequences."""
    import itertools

    from reazonspeech_tpu.models.rnnt import (
        joint_step,
        predictor_step,
        predictor_zero_state,
    )

    cfg = RNNTConfig(
        vocab_size=3, enc_dim=8, pred_hidden=8, joint_hidden=8,
        compute_dtype="float32",
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    pred, joint = init_predictor(k1, cfg), init_joint(k2, cfg)
    t = 3
    enc = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, t, cfg.enc_dim)), jnp.float32
    )
    lens = jnp.array([t])
    u_max = t  # buffer cap

    def score_path(labels_by_frame):
        """labels_by_frame: tuple of per-frame label tuples (emitted before
        the frame's closing blank). Returns total log prob."""
        state = predictor_zero_state(1, cfg)
        g, state = predictor_step(pred, jnp.array([cfg.blank_id]), state, cfg)
        total = 0.0
        n_emitted = 0
        for f in range(t):
            for lab in labels_by_frame[f]:
                logits = joint_step(joint, enc[:, f], g, cfg)
                lp = jax.nn.log_softmax(logits, -1)
                total += float(lp[0, lab])
                g, state = predictor_step(pred, jnp.array([lab]), state, cfg)
                n_emitted += 1
            logits = joint_step(joint, enc[:, f], g, cfg)
            lp = jax.nn.log_softmax(logits, -1)
            total += float(lp[0, cfg.blank_id])
        return total

    # enumerate all alignments with <= u_max total emissions
    best = (-1e30, None)
    labels = [i for i in range(cfg.num_classes) if i != cfg.blank_id]
    per_frame_opts = [()]
    for r in range(1, u_max + 1):
        per_frame_opts += list(itertools.product(labels, repeat=r))
    for combo in itertools.product(per_frame_opts, repeat=t):
        if sum(len(c) for c in combo) > u_max:
            continue
        s = score_path(combo)
        if s > best[0]:
            best = (s, tuple(x for c in combo for x in c))

    tokens, frames, counts, scores = rnnt_beam_decode(
        pred, joint, enc, lens, cfg,
        BeamDecodeConfig(beam_size=64, expand_labels=len(labels)),
    )
    c = int(counts[0])
    got_seq = tuple(tokens[0, :c].tolist())
    np.testing.assert_allclose(float(scores[0]), best[0], atol=1e-3)
    assert got_seq == best[1]
