"""Pose & VCRE loss primitives (jnp, batched, differentiable).

Counterparts of reference ``modules/loss/loss_utils.py`` including its
quirks (e.g. ``vcre_loss`` clipping both uv coordinates to [0, H]).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..evaluation.reprojection import get_grid_multipleheight
from ..geometry.projection import project_2d

_EYE = get_grid_multipleheight()[:, :3]  # (196, 3)


def rot_angle_loss(R: jnp.ndarray, Rgt: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """L1 residual rotation angle in radians (loss_utils.py:95-110).
    Returns (loss (B, 1), err (B,))."""
    residual = jnp.einsum("bji,bjk->bik", R, Rgt, precision=jax.lax.Precision.HIGHEST)
    trace = jnp.trace(residual, axis1=-2, axis2=-1)
    cosine = jnp.clip((trace - 1.0) / 2.0, -0.99999, 0.99999)
    err = jnp.arccos(cosine)
    return jnp.abs(err)[:, None], err


def trans_l1_loss(t: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    """(B, 1): L1 over the translation vector (loss_utils.py:85-93)."""
    return jnp.sum(jnp.abs(t - tgt), axis=-1)


def trans_ang_loss(t: jnp.ndarray, tgt: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Angular translation error, symmetric about pi (loss_utils.py:68-83)."""
    scale_t = jnp.linalg.norm(t, axis=-1)
    scale_tgt = jnp.linalg.norm(tgt, axis=-1)
    cosine = jnp.einsum("bij,bkj->bik", t, tgt)[:, :, 0] / (scale_t * scale_tgt + 1e-6)
    cosine = jnp.clip(cosine, -0.99999, 0.99999)
    err = jnp.arccos(cosine)
    err = jnp.minimum(err, jnp.pi - err)
    return jnp.abs(err), err


def compute_pose_loss(R, t, Rgt, tgt, K0=None, K1=None, soft_clipping: bool = True):
    """loss = [tanh-clipped] rot-angle + L1 trans (loss_utils.py:26-38).
    Returns (loss (B,1), loss_rot (B,1), loss_trans (B,1))."""
    loss_rot, _ = rot_angle_loss(R, Rgt)
    loss_trans = trans_l1_loss(t, tgt)
    if soft_clipping:
        loss = jnp.tanh(loss_rot / 0.9) + jnp.tanh(loss_trans / 0.9)
    else:
        loss = loss_rot + loss_trans
    return loss, loss_rot, loss_trans


def _vcre_one_direction(R, t, Rgt, tgt, K, H: float = 720.0) -> jnp.ndarray:
    """Reference ``vcre_loss`` (lib/utils/metrics.py:56-80): residual grid
    reprojection with BOTH uv coords clipped to [0, H] (reference quirk kept
    for gradient parity). Returns (B, 1)."""
    B = R.shape[0]
    eye = jnp.asarray(_EYE, jnp.float32)[None]
    eye = jnp.broadcast_to(eye, (B,) + _EYE.shape)

    uv_gt = project_2d(eye, K)
    eye_tmp = jnp.einsum("bij,bnj->bni", R, eye, precision=jax.lax.Precision.HIGHEST) + t
    # Rgt^T @ eye_tmp - Rgt^T @ tgt
    eyes_residual = jnp.einsum(
        "bji,bnj->bni", Rgt, eye_tmp, precision=jax.lax.Precision.HIGHEST
    ) - jnp.einsum("bji,bnj->bni", Rgt, tgt, precision=jax.lax.Precision.HIGHEST)
    uv_pred = project_2d(eyes_residual, K)

    uv_gt = jnp.clip(uv_gt, 0.0, H)
    uv_pred = jnp.clip(uv_pred, 0.0, H)
    err = jnp.sqrt(jnp.sum((uv_gt - uv_pred) ** 2, axis=-1) + 1e-6)
    return jnp.mean(err, axis=-1, keepdims=True)


def compute_vcre_loss(R, t, Rgt, tgt, K0, K1, soft_clipping: bool = True):
    """Symmetric VCRE loss (loss_utils.py:40-66): both directions averaged,
    tanh(x/80) soft clip. Returns (loss, loss_rot, loss_trans), each (B, 1)."""
    R_inv = jnp.swapaxes(R, 1, 2)
    t_inv = -jnp.einsum("bij,bkj->bki", R_inv, t, precision=jax.lax.Precision.HIGHEST)
    Rgt_inv = jnp.swapaxes(Rgt, 1, 2)
    tgt_inv = -jnp.einsum("bij,bkj->bki", Rgt_inv, tgt, precision=jax.lax.Precision.HIGHEST)

    loss0 = _vcre_one_direction(R, t, Rgt, tgt, K0)
    loss1 = _vcre_one_direction(R_inv, t_inv, Rgt_inv, tgt_inv, K1)
    loss = (loss0 + loss1) / 2.0
    if soft_clipping:
        loss = jnp.tanh(loss / 80.0)

    loss_rot, _ = rot_angle_loss(R, Rgt)
    loss_trans = trans_l1_loss(t, tgt)
    return loss, loss_rot, loss_trans


def compute_angular_error(R, t, Rgt, tgt):
    """max(rot, trans-angle) loss variant (loss_utils.py:5-10)."""
    loss_rot, _ = rot_angle_loss(R, Rgt)
    loss_trans, _ = trans_ang_loss(t, tgt)
    max_loss = jnp.max(jnp.concatenate([loss_rot, loss_trans], axis=-1), axis=-1)
    return max_loss, loss_rot, loss_trans


def compute_angular_error_weighted(R, t, Rgt, tgt, weights_t):
    """Weighted-translation variant (loss_utils.py:12-17)."""
    loss_rot, _ = rot_angle_loss(R, Rgt)
    loss_trans, _ = trans_ang_loss(t, tgt)
    max_loss = jnp.max(jnp.concatenate([loss_rot, loss_trans * weights_t], axis=-1), axis=-1)
    return max_loss, loss_rot, loss_trans


def ess_sq_euclidean_error(E: jnp.ndarray, Egt: jnp.ndarray) -> jnp.ndarray:
    """Normalized essential-matrix squared error (loss_utils.py:19-24)."""
    B = E.shape[0]
    E_norm = E / E[:, 2, 2].reshape(B, 1, 1)
    Egt_norm = Egt / Egt[:, 2, 2].reshape(B, 1, 1)
    return jnp.sum(jnp.square(E_norm - Egt_norm).reshape(B, -1), axis=1)
