"""Inlier counting for 3D-3D hypotheses (jittable, batched).

Counterparts of reference ``training_utils.py:55-82``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .projection import project_2d, transform_points


def pairwise_distance(X0: jnp.ndarray, X1: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Residual distance ||R X0 + t - X1|| per correspondence: (..., N)."""
    X0_to_1 = transform_points(R, t, X0)
    d2 = jnp.sum((X0_to_1 - X1) ** 2, axis=-1)
    return jnp.sqrt(d2 + 1e-6)


def soft_inlier_counting_3d(X0, X1, R, t, th: float = 0.5) -> jnp.ndarray:
    """Soft inlier count: sum sigmoid(beta (th - dist)), beta = 5/th.

    Matches reference ``soft_inlier_counting_3d`` (training_utils.py:55-61)
    including the ``+1e-6`` inside the sqrt. Returns (..., 1).
    """
    beta = 5.0 / th
    dist = pairwise_distance(X0, X1, R, t)
    scores = jax.nn.sigmoid(beta * (th - dist))
    return jnp.sum(scores, axis=-1, keepdims=True)


def inlier_counting_3d(X0, X1, R, t, th: float = 0.5) -> jnp.ndarray:
    """Hard inlier mask (..., N) in {0, 1} (training_utils.py:71-75)."""
    dist = pairwise_distance(X0, X1, R, t)
    return ((th - dist) >= 0).astype(X0.dtype)


def soft_inlier_counting_2d(X0, xy1, R, t, K1, th: float = 10.0) -> jnp.ndarray:
    """2D reprojection soft inlier count (training_utils.py:45-52)."""
    beta = 5.0 / th
    X0_to_1 = transform_points(R, t, X0)
    kp0_to_1 = project_2d(X0_to_1, K1)
    dist = jnp.sqrt(jnp.sum((kp0_to_1 - xy1) ** 2, axis=-1) + 1e-6)
    scores = jax.nn.sigmoid(beta * (th - dist))
    return jnp.sum(scores, axis=-1, keepdims=True)
