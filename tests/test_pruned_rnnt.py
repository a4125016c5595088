"""Pruned / simple transducer losses vs the full-joint reference loss.

The simple loss must be value- AND gradient-identical to losses.rnnt_loss
evaluated on the broadcast trivial joiner (same math, factorized normalizer);
the pruned loss must equal the full loss exactly when the band covers the
whole lattice, and upper-bound it when it doesn't. k2/icefall semantics
(the objective behind the zipformer flavor's published checkpoints,
pkg/k2-asr/src/huggingface.py:73-83), TPU-native implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.models.rnnt import (
    RNNTConfig,
    init_joint,
    init_predictor,
    joint_full,
    predictor_sequence,
)
from reazonspeech_tpu.training.losses import rnnt_loss
from reazonspeech_tpu.training.pruned_rnnt import (
    init_simple_joint,
    prune_ranges,
    pruned_loss_bundle,
    rnnt_loss_pruned,
    rnnt_loss_simple,
)


def _problem(seed=0, b=3, t=12, u=5, k=17, blank_last=True):
    rng = np.random.default_rng(seed)
    blank = k - 1 if blank_last else 0
    lo = 0 if blank_last else 1
    am = jnp.asarray(rng.standard_normal((b, t, k)), jnp.float32)
    lm = jnp.asarray(rng.standard_normal((b, u + 1, k)), jnp.float32)
    labels = jnp.asarray(rng.integers(lo, k - (1 if blank_last else 0), (b, u)),
                         jnp.int32)
    tlens = jnp.asarray([t, t - 3, t - 1][:b], jnp.int32)
    ulens = jnp.asarray([u, u - 2, u - 1][:b], jnp.int32)
    return am, lm, labels, tlens, ulens, blank


@pytest.mark.parametrize("blank_last", [True, False])
def test_simple_loss_matches_full_loss_values_and_grads(blank_last):
    am, lm, labels, tlens, ulens, blank = _problem(blank_last=blank_last)

    def simple(args):
        a, l = args
        return jnp.sum(rnnt_loss_simple(a, l, tlens, labels, ulens, blank))

    def full(args):
        a, l = args
        logits = a[:, :, None, :] + l[:, None, :, :]
        return jnp.sum(rnnt_loss(logits, tlens, labels, ulens, blank))

    v_s, g_s = jax.value_and_grad(simple)((am, lm))
    v_f, g_f = jax.value_and_grad(full)((am, lm))
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_f), rtol=1e-5)
    for gs, gf in zip(g_s, g_f):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gf), rtol=1e-4, atol=1e-5)


def test_prune_ranges_feasible():
    am, lm, labels, tlens, ulens, blank = _problem(seed=1)
    b, t, _ = am.shape
    u = labels.shape[1]
    for s in (2, 3, u + 1):
        r = np.asarray(prune_ranges(am, lm, tlens, labels, ulens, blank, s))
        s_eff = min(s, u + 1)
        assert r.shape == (b, t)
        assert (r[:, 0] == 0).all()
        d = np.diff(r, axis=1)
        assert (d >= 0).all() and (d <= s_eff - 1).all()
        assert (r >= 0).all() and (r <= u + 1 - s_eff).all()
        for i in range(b):
            tb, ub = int(tlens[i]), int(ulens[i])
            # terminal cell (T_b-1, U_b) inside the band
            assert r[i, tb - 1] <= ub <= r[i, tb - 1] + s_eff - 1


def _joint_problem(seed=0, b=3, t=10, u=4):
    cfg = RNNTConfig.tiny(vocab_size=13)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    kj, kp = jax.random.split(key)
    jp = init_joint(kj, cfg)
    pp = init_predictor(kp, cfg)
    enc = jnp.asarray(rng.standard_normal((b, t, cfg.enc_dim)) * 0.5,
                      jnp.float32)
    labels = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, u)), jnp.int32)
    pred = predictor_sequence(pp, labels, cfg)
    tlens = jnp.asarray([t, t - 2, t - 4][:b], jnp.int32)
    ulens = jnp.asarray([u, u - 1, u - 2][:b], jnp.int32)
    return cfg, jp, enc, pred, labels, tlens, ulens


@pytest.mark.slow
def test_pruned_loss_full_band_equals_full_loss():
    """Band = whole lattice (s_range = U+1, ranges = 0) -> the pruned DP
    must reproduce losses.rnnt_loss on joint_full EXACTLY (same params,
    same lattice), values and joint-param gradients."""
    cfg, jp, enc, pred, labels, tlens, ulens = _joint_problem()
    b, t, _ = enc.shape
    u = labels.shape[1]
    ranges = jnp.zeros((b, t), jnp.int32)

    def pruned(p):
        return jnp.sum(rnnt_loss_pruned(
            p, enc, pred, ranges, labels, tlens, ulens, cfg, u + 1))

    def full(p):
        logits = joint_full(p, enc, pred, cfg)
        return jnp.sum(rnnt_loss(logits, tlens, labels, ulens, cfg.blank_id))

    v_p, g_p = jax.value_and_grad(pruned)(jp)
    v_f, g_f = jax.value_and_grad(full)(jp)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_f), rtol=1e-5)
    flat_p = jax.tree_util.tree_leaves(g_p)
    flat_f = jax.tree_util.tree_leaves(g_f)
    for a, c in zip(flat_p, flat_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pruned_loss_upper_bounds_full_loss():
    """A narrow band keeps a subset of the paths -> NLL >= the full NLL,
    and stays finite when the band is feasible."""
    cfg, jp, enc, pred, labels, tlens, ulens = _joint_problem(seed=2)
    key = jax.random.PRNGKey(7)
    sp = init_simple_joint(key, cfg)
    loss, aux = pruned_loss_bundle(
        sp, jp, enc, pred, labels, tlens, ulens, cfg, s_range=3)
    logits = joint_full(jp, enc, pred, cfg)
    full = rnnt_loss(logits, tlens, labels, ulens, cfg.blank_id)
    pruned = np.asarray(aux["pruned"])
    assert np.isfinite(pruned).all()
    assert (pruned >= np.asarray(full) - 1e-4).all()
    assert np.isfinite(np.asarray(aux["simple"])).all()
    assert np.isfinite(np.asarray(loss)).all()


@pytest.mark.slow
def test_pruned_bundle_differentiable_end_to_end():
    """grad flows to encoder activations, predictor outputs, simple + joint
    params — the training seam the pruned objective plugs into."""
    cfg, jp, enc, pred, labels, tlens, ulens = _joint_problem(seed=3)
    sp = init_simple_joint(jax.random.PRNGKey(1), cfg)

    def obj(sp_, jp_, enc_, pred_):
        loss, _ = pruned_loss_bundle(
            sp_, jp_, enc_, pred_, labels, tlens, ulens, cfg, s_range=3)
        return jnp.mean(loss)

    grads = jax.grad(obj, argnums=(0, 1, 2, 3))(sp, jp, enc, pred)
    for g in jax.tree_util.tree_leaves(grads):
        arr = np.asarray(g)
        assert np.isfinite(arr).all()
    # the pruned term must actually touch the real joint
    assert float(np.abs(np.asarray(grads[1]["out"]["w"])).max()) > 0.0


@pytest.mark.slow
def test_train_step_pruned_loss():
    """make_train_step(loss='pruned') runs end-to-end (waveform -> pruned
    objective -> AdamW update) and updates the simple-joint params."""
    import optax

    from reazonspeech_tpu.frontend.features import nemo_frontend_config
    from reazonspeech_tpu.models.fastconformer import FastConformerConfig
    from reazonspeech_tpu.nemo.asr.model import init_params
    from reazonspeech_tpu.training.pruned_rnnt import init_simple_joint
    from reazonspeech_tpu.training.train_step import make_train_step

    fe_cfg = nemo_frontend_config()
    enc_cfg = FastConformerConfig.tiny()
    cfg = RNNTConfig.tiny(vocab_size=13, enc_dim=enc_cfg.d_model)
    params = init_params(0, enc_cfg, cfg)
    params["simple_joint"] = init_simple_joint(jax.random.PRNGKey(1), cfg)

    init_state, step_fn = make_train_step(
        fe_cfg, enc_cfg, cfg, optimizer=optax.adamw(1e-3), loss="pruned",
        s_range=3)
    state = init_state(params)
    rng = np.random.default_rng(0)
    n = 16000
    batch = {
        "waveform": jnp.asarray(
            rng.standard_normal((2, n), dtype=np.float32) * 0.1),
        "lengths": jnp.asarray([n, n - 4000], jnp.int32),
        "labels": jnp.asarray(rng.integers(1, 13, (2, 6)), jnp.int32),
        "label_lengths": jnp.asarray([6, 4], jnp.int32),
    }
    state2, metrics = jax.jit(step_fn)(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    before = np.asarray(params["simple_joint"]["am"]["w"])
    after = np.asarray(state2.params["simple_joint"]["am"]["w"])
    assert not np.allclose(before, after)
