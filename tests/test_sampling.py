"""Statistical tests for Gumbel top-k weighted sampling (multinomial parity)."""

import numpy as np
import jax
import jax.numpy as jnp

from mickey_tpu.ops import weighted_sample_without_replacement


def test_no_replacement():
    key = jax.random.PRNGKey(0)
    w = jnp.ones((4, 100))
    idx = np.asarray(weighted_sample_without_replacement(key, w, 50))
    for row in idx:
        assert len(set(row.tolist())) == 50


def test_zero_weights_never_sampled():
    key = jax.random.PRNGKey(1)
    w = np.ones((2, 64), dtype=np.float32)
    w[:, 32:] = 0.0
    idx = np.asarray(weighted_sample_without_replacement(key, jnp.array(w), 16))
    assert (idx < 32).all()


def test_marginals_match_weights():
    """First-draw marginal of Gumbel top-k equals the categorical distribution."""
    n, trials = 8, 20000
    w = np.array([1, 2, 3, 4, 5, 6, 7, 8], dtype=np.float32)
    p = w / w.sum()
    keys = jax.random.split(jax.random.PRNGKey(2), trials)
    sample = jax.jit(lambda k: weighted_sample_without_replacement(k, jnp.array(w), 1)[0])
    first = np.asarray(jax.vmap(sample)(keys)).reshape(-1)
    counts = np.bincount(first, minlength=n) / trials
    # chi-square-ish tolerance: 4 sigma of binomial std
    tol = 4 * np.sqrt(p * (1 - p) / trials)
    assert (np.abs(counts - p) < tol).all(), (counts, p)


def test_without_replacement_distribution():
    """Pairs (k=2) follow the Plackett-Luce w/o-replacement law."""
    w = np.array([5.0, 3.0, 2.0], dtype=np.float32)
    trials = 30000
    keys = jax.random.split(jax.random.PRNGKey(3), trials)
    sample = jax.jit(lambda k: weighted_sample_without_replacement(k, jnp.array(w), 2))
    out = np.asarray(jax.vmap(sample)(keys))  # (trials, 2)
    p = w / w.sum()
    # P(first=i, second=j) = p_i * p_j / (1 - p_i)
    for i in range(3):
        for j in range(3):
            if i == j:
                continue
            expected = p[i] * p[j] / (1 - p[i])
            got = ((out[:, 0] == i) & (out[:, 1] == j)).mean()
            assert abs(got - expected) < 4 * np.sqrt(expected * (1 - expected) / trials)


def test_approx_mode_runs():
    key = jax.random.PRNGKey(4)
    w = jnp.ones((2, 4096))
    idx = np.asarray(weighted_sample_without_replacement(key, w, 128, approx=True))
    assert idx.shape == (2, 128)
    for row in idx:
        assert len(set(row.tolist())) == 128
