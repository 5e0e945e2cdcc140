"""Pallas TPU fused hypothesis scoring (SURVEY §7's third named kernel).

RANSAC scoring — transform S sampled correspondences by R candidate poses and
soft-count inliers — is the solver's hot loop (reference
``probabilisticProcrustes.py:259-275`` scores via a chain of broadcast torch
ops; ``training_utils.py:55-61`` defines the soft count). In XLA the
(B, R, S, 3) transformed cloud and the (B, R, S) distance tensor round-trip
HBM between the batched matmul and the elementwise tail, and the S*3 x 3x3
matmuls are too skinny for the MXU anyway.

This kernel keeps everything in VMEM: one grid program per batch element,
hypotheses vectorized over SUBLANES (R_pad rows) and samples over LANES
(S columns). The rotation is applied as 9 scalar-column broadcasts —
(R_pad, 1) x (1, S) FMAs on the VPU — so the (R, S) distance matrix lives
only in vector registers; HBM sees just the tiny X/Y/R/t inputs and the
(B, R) output.

Inference-only (the solver is never differentiated; the training loss keeps
its own surrogate path), mirroring the reference where scoring happens under
torch.no_grad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scoring_kernel(xt_ref, yt_ref, r_ref, t_ref, o_ref, *, th: float):
    """One batch element: soft-count inliers for all R_pad hypotheses.

    xt_ref/yt_ref: (1, 3, S) component-major point clouds; r_ref:
    (1, R_pad, 9) row-major rotations; t_ref: (1, R_pad, 3); o_ref: the FULL
    (B, R_pad) soft-inlier output — its block is the whole array (a
    (1, R_pad) per-program block would break the Mosaic sublane rule: the
    second-minor block dim must be 8-divisible or equal to the array dim,
    which interpret mode does not check); each program stores its own row
    at pl.program_id(0).
    """
    beta = 5.0 / th
    acc = None
    for i in range(3):  # output component i of R X + t
        comp = t_ref[0, :, i : i + 1]  # (R_pad, 1)
        for j in range(3):
            comp = comp + r_ref[0, :, 3 * i + j : 3 * i + j + 1] * xt_ref[0, j : j + 1, :]
        diff = comp - yt_ref[0, i : i + 1, :]  # (R_pad, S)
        sq = diff * diff
        acc = sq if acc is None else acc + sq
    dist = jnp.sqrt(acc + 1e-6)  # the reference's +1e-6 (training_utils.py:57)
    scores = jax.nn.sigmoid(beta * (th - dist))
    o_ref[pl.ds(pl.program_id(0), 1), :] = jnp.sum(scores, axis=1)[None, :]


@functools.partial(jax.jit, static_argnames=("th", "interpret"))
def fused_hypothesis_scores(
    X: jnp.ndarray,  # (B, S, 3) sampled points, camera 0
    Y: jnp.ndarray,  # (B, S, 3) sampled points, camera 1
    R: jnp.ndarray,  # (B, R, 3, 3) candidate rotations
    t: jnp.ndarray,  # (B, R, 1, 3) or (B, R, 3) candidate translations
    th: float = 0.3,
    interpret: bool = False,
) -> jnp.ndarray:
    """Soft inlier count sum_s sigmoid(beta (th - ||R X_s + t - Y_s||)) for
    every (batch, hypothesis): returns (B, R) fp32.

    Bitwise-equivalent math to geometry.soft_inlier_counting_3d (same beta,
    same +1e-6-in-sqrt), with S on lanes and hypotheses on sublanes.
    """
    B, S, _ = X.shape
    nR = R.shape[1]
    r_pad = -(-nR // 8) * 8  # sublane multiple

    Xt = jnp.swapaxes(X.astype(jnp.float32), 1, 2)  # (B, 3, S)
    Yt = jnp.swapaxes(Y.astype(jnp.float32), 1, 2)
    R9 = R.astype(jnp.float32).reshape(B, nR, 9)
    t3 = t.astype(jnp.float32).reshape(B, nR, 3)
    if r_pad != nR:
        R9 = jnp.pad(R9, ((0, 0), (0, r_pad - nR), (0, 0)))
        t3 = jnp.pad(t3, ((0, 0), (0, r_pad - nR), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_scoring_kernel, th=float(th)),
        out_shape=jax.ShapeDtypeStruct((B, r_pad), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, S), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_pad, 9), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_pad, 3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, r_pad), lambda b: (0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=30 * B * r_pad * S,
            bytes_accessed=(2 * 3 * S + r_pad * 12 + r_pad) * B * 4,
            transcendentals=2 * B * r_pad * S,  # sqrt + sigmoid
        ),
        interpret=interpret,
    )(Xt, Yt, R9, t3)
    return out[:, :nR]


def hypothesis_scores(X, Y, R, t, th: float, use_pallas: bool, interpret: bool = False):
    """Dispatch: fused kernel on TPU (or interpret mode), XLA fallback
    (geometry.soft_inlier_counting_3d broadcast form) elsewhere."""
    if use_pallas and (interpret or jax.default_backend() != "cpu"):
        return fused_hypothesis_scores(X, Y, R, t, th=float(th), interpret=interpret)
    from ..geometry import soft_inlier_counting_3d

    return soft_inlier_counting_3d(X[:, None], Y[:, None], R, t, th=th)[..., 0]
