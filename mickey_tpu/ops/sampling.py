"""Weighted sampling without replacement via Gumbel top-k (jittable).

The reference samples correspondences with ``torch.multinomial(probs, k)``
(without replacement) at two levels of its probabilistic RANSAC
(``probabilisticProcrustes.py:231,251``; ``loss_class.py:138,159``).  That op
is host-unfriendly and stateful.  The TPU-native equivalent is the
Gumbel-top-k trick: ``argtop_k(log p_i + G_i)`` with iid Gumbel noise draws
exactly a sample without replacement from the categorical distribution — one
fused, vmappable op driven by explicit PRNG keys.

For very large categorical supports (the N^2 ≈ 3.7M match matrix) exact
``lax.top_k`` is the default; ``jax.lax.approx_max_k`` can be selected for
extra throughput (recall ≈ 0.95, statistically immaterial for RANSAC
proposal sampling — documented deviation).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def gumbel_topk_sample(
    key: jax.Array,
    log_weights: jnp.ndarray,
    k: int,
    approx: bool = False,
) -> jnp.ndarray:
    """Sample k indices without replacement ∝ exp(log_weights).

    log_weights: (..., N) unnormalized log-probabilities; entries of -inf (or
    <= _NEG_INF) are never sampled. Returns int32 indices (..., k).
    """
    g = jax.random.gumbel(key, log_weights.shape, dtype=log_weights.dtype)
    perturbed = log_weights + g
    if k <= 8:
        # Small-k path: XLA lowers top_k to a full sort, which is ~10x the
        # cost of k unrolled argmax+mask reductions for minimal RANSAC sets.
        idxs = []
        for _ in range(k):
            i = jnp.argmax(perturbed, axis=-1)
            idxs.append(i)
            perturbed = jnp.where(
                jax.nn.one_hot(i, perturbed.shape[-1], dtype=bool), -jnp.inf, perturbed
            )
        idx = jnp.stack(idxs, axis=-1)
    elif approx:
        _, idx = jax.lax.approx_max_k(perturbed, k)
    elif 4 * k >= perturbed.shape[-1]:
        # Large-k path: lax.top_k with k in the thousands is pathologically
        # slow on TPU; a full descending argsort + slice returns the exact
        # same index set ~2x faster when k is a sizable fraction of N
        # (measured 18 vs 9 ms at (160, 4096) -> 2048, tools/bench_topk.py).
        idx = jnp.argsort(-perturbed, axis=-1)[..., :k]
    else:
        _, idx = jax.lax.top_k(perturbed, k)
    return idx.astype(jnp.int32)


def gumbel_topk_sample_draws(
    key: jax.Array,
    log_weights: jnp.ndarray,
    k: int,
    draws: int,
    approx: bool = False,
    max_elems: int = 1 << 26,
) -> jnp.ndarray:
    """``draws`` independent Gumbel top-k samples: (draws, *batch, k) int32.

    All draws run as ONE batched top-k (the fast path — lets XLA tile the
    full (draws*batch, N) sort at once) when the perturbed tensor stays under
    ``max_elems`` elements (default 64M ≈ 256 MB fp32). Above that — the
    exact-sampling regime over the full ~3.7M-category match matrix with no
    prefilter — it falls back to a lax.scan of per-draw samples so peak
    memory stays at one (batch, N) noise tensor. The two paths draw from the
    IDENTICAL distribution (Gumbel noise is iid across draws either way);
    only the PRNG stream assignment differs.

    Note the fallback deliberately re-accepts the exact regime's known cost:
    ``draws`` sequential top_k(N -> k) kernels with k in the thousands are
    pathologically slow on TPU (~915 ms/solver-call at the benchmark point,
    BENCHLOG round 1). Exact mode trades that time for the exact reference
    distribution; the production configs use the prefilter and stay on the
    fast batched path.
    """
    if draws * math.prod(log_weights.shape) <= max_elems:
        all_lw = jnp.broadcast_to(log_weights[None], (draws,) + log_weights.shape)
        return gumbel_topk_sample(key, all_lw, k, approx=approx)

    def step(_, kk):
        return None, gumbel_topk_sample(kk, log_weights, k, approx=approx)

    _, idx = jax.lax.scan(step, None, jax.random.split(key, draws))
    return idx


def weighted_sample_without_replacement(
    key: jax.Array,
    weights: jnp.ndarray,
    k: int,
    approx: bool = False,
    eps: float = 1e-30,
) -> jnp.ndarray:
    """torch.multinomial(weights, k) equivalent (without replacement).

    weights: (..., N) nonnegative (not necessarily normalized).
    Zero-weight entries are excluded via -inf log-weight (torch.multinomial
    never draws zero-probability categories when enough support exists).
    """
    logw = jnp.where(weights > 0, jnp.log(jnp.maximum(weights, eps)), _NEG_INF)
    return gumbel_topk_sample(key, logw, k, approx=approx)
