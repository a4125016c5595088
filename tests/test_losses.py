import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.training.losses import ctc_loss, rnnt_loss


def naive_rnnt_nll(logits, t_len, labels, u_len, blank):
    """Straightforward O(T·U) log-space DP for one example."""
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    logp = np.asarray(logp, np.float64)
    T, U = t_len, u_len
    alpha = np.full((T, U + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(T):
        for u in range(U + 1):
            terms = []
            if t > 0:
                terms.append(alpha[t - 1, u] + logp[t - 1, u, blank])
            if u > 0:
                terms.append(alpha[t, u - 1] + logp[t, u - 1, labels[u - 1]])
            if terms:
                alpha[t, u] = np.logaddexp.reduce(terms)
    return -(alpha[T - 1, U] + logp[T - 1, U, blank])


def test_rnnt_loss_matches_naive():
    rng = np.random.default_rng(0)
    b, t, u, k = 3, 7, 4, 11
    blank = k - 1
    logits = rng.standard_normal((b, t, u + 1, k)).astype(np.float32)
    labels = rng.integers(0, k - 1, (b, u)).astype(np.int32)
    t_lens = np.array([7, 5, 3], np.int32)
    u_lens = np.array([4, 2, 0], np.int32)

    got = np.asarray(
        rnnt_loss(
            jnp.asarray(logits), jnp.asarray(t_lens), jnp.asarray(labels),
            jnp.asarray(u_lens), blank,
        )
    )
    for i in range(b):
        want = naive_rnnt_nll(logits[i], t_lens[i], labels[i], u_lens[i], blank)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)


def test_rnnt_loss_single_path():
    """T=1: the only path is U label emissions then final blank — the loss
    must equal that path's negative log prob exactly."""
    k, u = 5, 2
    blank = k - 1
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((1, 1, u + 1, k)).astype(np.float32)
    labels = np.array([[1, 3]], np.int32)
    got = float(
        rnnt_loss(
            jnp.asarray(logits), jnp.array([1]), jnp.asarray(labels),
            jnp.array([u]), blank,
        )[0]
    )
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))[0, 0]
    want = -(lp[0, 1] + lp[1, 3] + lp[2, blank])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_rnnt_loss_grad_finite():
    rng = np.random.default_rng(2)
    b, t, u, k = 2, 6, 3, 8
    logits = jnp.asarray(rng.standard_normal((b, t, u + 1, k)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, k - 1, (b, u)), jnp.int32)

    def f(lg):
        return rnnt_loss(lg, jnp.array([6, 4]), labels, jnp.array([3, 2]), k - 1).sum()

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_ctc_loss_runs():
    rng = np.random.default_rng(0)
    b, t, n, k = 2, 12, 4, 9
    logits = jnp.asarray(rng.standard_normal((b, t, k)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, k - 1, (b, n)), jnp.int32)
    loss = ctc_loss(logits, jnp.array([12, 8]), labels, jnp.array([4, 2]), blank_id=k - 1)
    assert loss.shape == (b,)
    assert np.isfinite(np.asarray(loss)).all()
    assert (np.asarray(loss) > 0).all()
