"""Camera projection primitives (batched, jittable).

Behavioral counterparts of the reference geometry layer
(``lib/models/MicKey/modules/utils/training_utils.py:7-35``), redesigned for
XLA: the 3x3 intrinsic inverse is closed-form (no ``linalg.inv`` solver call)
and everything broadcasts over arbitrary leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inv_intrinsics(K: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of pinhole intrinsics [[fx,0,cx],[0,fy,cy],[0,0,1]].

    K: (..., 3, 3). Assumes zero skew (true for Map-free data; reference reads
    fx, fy, cx, cy only — ``lib/datasets/mapfree.py:42-44``).
    """
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    row0 = jnp.stack([1.0 / fx, zeros, -cx / fx], axis=-1)
    row1 = jnp.stack([zeros, 1.0 / fy, -cy / fy], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def backproject_3d(uv: jnp.ndarray, depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Backproject pixels to camera-frame 3D points.

    uv: (..., N, 2) pixel coordinates
    depth: (..., N, 1) metric depth
    K: (..., 3, 3) intrinsics
    returns xyz: (..., N, 3)

    Matches reference ``training_utils.backproject_3d`` (:7-22):
    ``xyz = depth * (K^-1 @ [u, v, 1]^T)^T``.
    """
    ones = jnp.ones_like(uv[..., :1])
    uv1 = jnp.concatenate([uv, ones], axis=-1)  # (..., N, 3)
    Kinv = inv_intrinsics(K)
    xyz = jnp.einsum("...ij,...nj->...ni", Kinv, uv1, precision=jax.lax.Precision.HIGHEST)
    return depth * xyz


def project_2d(xyz: jnp.ndarray, K: jnp.ndarray, eps: float = 1e-16) -> jnp.ndarray:
    """Project camera-frame 3D points to pixels.

    xyz: (..., N, 3); K: (..., 3, 3); returns (..., N, 2).
    Matches reference ``training_utils.project_2d`` (:24-35) including the
    ``+1e-16`` depth guard (no abs, as in the reference).
    """
    cam = jnp.einsum("...ij,...nj->...ni", K, xyz, precision=jax.lax.Precision.HIGHEST)
    return cam[..., :2] / (cam[..., 2:3] + eps)


def transform_points(R: jnp.ndarray, t: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Apply rigid transform: R (...,3,3) @ X (...,N,3) + t (...,1,3).

    Written as broadcast multiply-adds rather than an einsum: a K=3
    contraction is useless to the MXU, and elementwise VPU math is exact fp32
    without multi-pass precision emulation — this is the RANSAC scoring hot
    loop (millions of point transforms per solve).
    """
    # (..., N, 1, 3) * (..., 1, 3, 3) summed over the last axis
    out = jnp.sum(X[..., None, :] * R[..., None, :, :], axis=-1)
    return out + t
