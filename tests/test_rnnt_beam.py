import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.decoding.rnnt_beam import BeamDecodeConfig, rnnt_beam_decode
from reazonspeech_tpu.decoding.rnnt_greedy import GreedyDecodeConfig, rnnt_greedy_decode
from reazonspeech_tpu.models.rnnt import RNNTConfig, init_joint, init_predictor
# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow



def make_model(kind="lstm", seed=1):
    cfg = RNNTConfig.tiny(compute_dtype="float32")
    if kind == "stateless":
        cfg = RNNTConfig(
            vocab_size=64, enc_dim=64, pred_hidden=32, joint_hidden=32,
            compute_dtype="float32", predictor_kind="stateless",
        )
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    pred, joint = init_predictor(k1, cfg), init_joint(k2, cfg)
    # bias the blank logit up so random-weight decodes emit sparsely and
    # terminate naturally — otherwise every frame spins to the emission cap
    # and greedy/ALSD compare their (structurally different) caps instead of
    # their search semantics
    joint["out"]["b"] = joint["out"]["b"].at[cfg.blank_id].add(5.0)
    return cfg, pred, joint


@pytest.mark.parametrize("kind", ["lstm", "stateless"])
def test_beam1_matches_greedy(kind):
    """beam_size=1 ALSD is exactly greedy (same candidate set, same argmax);
    greedy gets the same emission budget as the ALSD alignment bound."""
    cfg, pred, joint = make_model(kind)
    t = 15
    enc = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, t, cfg.enc_dim)), jnp.float32
    )
    lens = jnp.array([15, 9])
    gt, gf, gc = rnnt_greedy_decode(
        pred, joint, enc, lens, cfg,
        GreedyDecodeConfig(max_symbols_per_step=10_000, max_tokens=2 * t),
    )
    bt, bf, bc, _ = rnnt_beam_decode(
        pred, joint, enc, lens, cfg, BeamDecodeConfig(beam_size=1)
    )
    for i in range(2):
        c = int(gc[i])
        assert int(bc[i]) == c
        assert bt[i, :c].tolist() == gt[i, :c].tolist()
        assert bf[i, :c].tolist() == gf[i, :c].tolist()


def test_beam_scores_not_worse_than_greedy():
    """With raw-score selection and deduplicating recombination, a wider beam
    must not return a lower-probability result."""
    cfg, pred, joint = make_model()
    enc = jnp.asarray(
        np.random.default_rng(2).standard_normal((3, 12, cfg.enc_dim)), jnp.float32
    )
    lens = jnp.array([12, 12, 7])
    base = dict(score_norm=False, recombine_dedup=True)
    _, _, _, s1 = rnnt_beam_decode(
        pred, joint, enc, lens, cfg, BeamDecodeConfig(beam_size=1, **base)
    )
    _, _, _, s8 = rnnt_beam_decode(
        pred, joint, enc, lens, cfg, BeamDecodeConfig(beam_size=8, **base)
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
    assert tokens.shape == frames.shape == (2, 20)  # T + u_max buffer
    for i in range(2):
        c = int(counts[i])
        fr = frames[i, :c].tolist()
        assert fr == sorted(fr)
        if c:
            assert max(fr) < int(lens[i])
    assert np.isfinite(np.asarray(scores)).all()


def test_beam_zero_length_rows():
    """Padding rows (enc_length 0) decode to zero emissions — serving
    batches rely on this invariance."""
    cfg, pred, joint = make_model()
    enc = jnp.asarray(
        np.random.default_rng(4).standard_normal((3, 8, cfg.enc_dim)), jnp.float32
    )
    lens = jnp.array([8, 0, 5])
    tokens, frames, counts, _ = rnnt_beam_decode(
        pred, joint, enc, lens, cfg, BeamDecodeConfig(beam_size=4)
    )
    assert int(counts[1]) == 0

    # and the populated rows are invariant to the padding row's contents
    enc2 = enc.at[1].set(99.0)
    tokens2, _, counts2, _ = rnnt_beam_decode(
        pred, joint, enc2, lens, cfg, BeamDecodeConfig(beam_size=4)
    )
    for i in (0, 2):
        c = int(counts[i])
        assert int(counts2[i]) == c
        assert tokens[i, :c].tolist() == tokens2[i, :c].tolist()


def _enumerate_paths(pred, joint, cfg, enc, t, u_max):
    """All alignments with <= u_max emissions: {label_seq: [path log probs]}."""
    import itertools

    from reazonspeech_tpu.models.rnnt import (
        joint_step,
        predictor_step,
        predictor_zero_state,
    )

    def score_path(labels_by_frame):
        state = predictor_zero_state(1, cfg)
        g, state = predictor_step(pred, jnp.array([cfg.blank_id]), state, cfg)
        total = 0.0
        for f in range(t):
            for lab in labels_by_frame[f]:
                logits = joint_step(joint, enc[:, f], g, cfg)
                lp = jax.nn.log_softmax(logits, -1)
                total += float(lp[0, lab])
                g, state = predictor_step(pred, jnp.array([lab]), state, cfg)
            logits = joint_step(joint, enc[:, f], g, cfg)
            lp = jax.nn.log_softmax(logits, -1)
            total += float(lp[0, cfg.blank_id])
        return total

    labels = [i for i in range(cfg.num_classes) if i != cfg.blank_id]
    per_frame_opts = [()]
    for r in range(1, u_max + 1):
        per_frame_opts += list(itertools.product(labels, repeat=r))
    seq_paths = {}
    for combo in itertools.product(per_frame_opts, repeat=t):
        if sum(len(c) for c in combo) > u_max:
            continue
        seq = tuple(x for c in combo for x in c)
        seq_paths.setdefault(seq, []).append(score_path(combo))
    return seq_paths


def test_beam_finds_best_sequence_posterior_bruteforce():
    """On a tiny problem with an exhaustive beam and deduplicating
    recombination, ALSD computes each label sequence's full posterior
    (log-sum over its alignments) and returns the sequence with the best
    length-normalised posterior — verified against brute-force enumeration.

    The beam must be wide enough for ZERO pruning: live sequences can grow
    to T + u_max = 6 tokens (only finals are bounded by u_max), so at the
    last step up to 3^3+3^4+3^5 = 351 sequences are alive, each proposing 3
    candidates -> beam 1100 keeps everything. (At practical widths ALSD is
    approximate by design; faithfulness at width 4 is covered by the serial
    oracle test below.)"""
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

    seq_paths = _enumerate_paths(pred, joint, cfg, enc, t, u_max=t)
    from scipy.special import logsumexp

    posts = {s: float(logsumexp(p)) for s, p in seq_paths.items()}
    want_seq = max(posts, key=lambda s: posts[s] / (len(s) + 1))

    tokens, frames, counts, scores = rnnt_beam_decode(
        pred, joint, enc, lens, cfg,
        BeamDecodeConfig(beam_size=1100, recombine_dedup=True),
    )
    c = int(counts[0])
    got_seq = tuple(tokens[0, :c].tolist())
    assert got_seq == want_seq
    np.testing.assert_allclose(float(scores[0]), posts[want_seq], atol=1e-3)


def test_beam_matches_serial_torch_oracle():
    """The batched fixed-shape ALSD equals the serial NeMo-reading oracle
    (tools/torch_reference.rnnt_alsd_reference) token-and-frame exact, in
    BOTH recombination modes, on weights shared via the fixture converter."""
    import os
    import sys
    import tempfile

    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from fixture_checkpoints import write_nemo_archive
    from torch_reference import rnnt_alsd_reference

    from reazonspeech_tpu.convert.nemo_fastconformer import (
        convert_nemo_checkpoint,
        read_nemo_tar,
    )
    from reazonspeech_tpu.models.fastconformer import FastConformerConfig

    enc_cfg = FastConformerConfig.tiny()
    rnnt_cfg = RNNTConfig.tiny(enc_dim=enc_cfg.d_model, compute_dtype="float32")
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "model.nemo")
        write_nemo_archive(p, enc_cfg, rnnt_cfg)
        params, _, conv_rnnt = convert_nemo_checkpoint(p, os.path.join(td, "c"))
        sd, _, _ = read_nemo_tar(p)
    sd = {k: v.float() for k, v in sd.items()}
    jparams = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(7)
    enc = rng.standard_normal((2, 12, rnnt_cfg.enc_dim)).astype(np.float32) * 0.5
    lens = [12, 8]
    for dedup in (False, True):
        bt, bf, bc, _ = rnnt_beam_decode(
            jparams["predictor"], jparams["joint"], jnp.asarray(enc),
            jnp.asarray(lens), rnnt_cfg,
            BeamDecodeConfig(beam_size=4, recombine_dedup=dedup),
        )
        for i, L in enumerate(lens):
            rt, rf, _ = rnnt_alsd_reference(
                sd, torch.from_numpy(enc[i, :L]), rnnt_cfg.vocab_size,
                beam_size=4, recombine_dedup=dedup,
            )
            c = int(bc[i])
            assert bt[i, :c].tolist() == rt, (dedup, i)
            assert bf[i, :c].tolist() == rf, (dedup, i)
