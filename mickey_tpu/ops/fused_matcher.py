"""Fused descriptor-correlation + dustbin + dual-softmax Pallas kernel.

The XLA dual-softmax (``nn/matcher.py``) materializes the (N0+1)x(N1+1)
coupling matrix and both softmaxes in fp32 HBM — ~4 full passes over
~15 MB/pair at the production operating point (N=1938). This kernel streams
the correlation through VMEM twice and writes the final product ONCE:

  pass 1 (column stats): per M-block, compute the correlation block
      dsc0 @ dsc1^T / T and accumulate online column max / sum-exp into a
      revisited stats block — the couplings never hit HBM;
  tiny XLA glue: column logsumexp + analytic dustbin augmentation
      (the dustbin row/col are constant alpha, so their effect on both
      softmax denominators is a closed-form logaddexp with alpha);
  pass 2 (output): recompute the correlation block, compute the row
      logsumexp in-block (rows are fully resident), and emit
      exp(s - lse_row - lse_col) = softmax(axis=1) * softmax(axis=2).

Correlation FLOPs are paid twice (~2 x M*N*C ~ 1 GFLOP/pair — noise next to
the 26 TFLOP backbone) to avoid ~3 extra HBM round-trips of the coupling
matrix. Forward-only: training uses the XLA path (autodiff), inference the
kernel; behavioral spec: reference ``feature_matcher.py:54-83``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _corr_block(dsc0_ref, dsc1_ref, inv_temp: float) -> jnp.ndarray:
    d0 = dsc0_ref[0].astype(jnp.float32)  # (block_m, C)
    d1 = dsc1_ref[0].astype(jnp.float32)  # (N_pad, C)
    return (
        jax.lax.dot_general(
            d0, d1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * inv_temp
    )


def _col_stats_kernel(
    dsc0_ref, dsc1_ref, stats_ref, *, inv_temp: float, m_valid: int, n_valid: int, block_m: int
):
    """Online column max/sum-exp accumulation over M-blocks (grid: B x M_T)."""
    m_i = pl.program_id(1)
    s = _corr_block(dsc0_ref, dsc1_ref, inv_temp)
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + m_i * block_m
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where((row < m_valid) & (col < n_valid), s, _NEG_INF)

    @pl.when(m_i == 0)
    def _():
        stats_ref[0, 0, :] = jnp.full((s.shape[1],), _NEG_INF, jnp.float32)
        stats_ref[0, 1, :] = jnp.zeros((s.shape[1],), jnp.float32)

    run_max = stats_ref[0, 0, :]
    run_sum = stats_ref[0, 1, :]
    new_max = jnp.maximum(run_max, jnp.max(s, axis=0))
    # padded columns keep new_max == _NEG_INF; exp(0)=1 garbage accumulates
    # there but those columns are cropped by the caller.
    scale = jnp.exp(run_max - new_max)
    stats_ref[0, 1, :] = scale * run_sum + jnp.sum(jnp.exp(s - new_max[None, :]), axis=0)
    stats_ref[0, 0, :] = new_max


def _pair_softmax_kernel(
    dsc0_ref, dsc1_ref, lse_col_ref, alpha_ref, out_ref, *, inv_temp: float, n_valid: int
):
    """softmax(axis=1) * softmax(axis=2) of the implicit couplings, cropped."""
    s = _corr_block(dsc0_ref, dsc1_ref, inv_temp)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, _NEG_INF)

    alpha = alpha_ref[0, 0]
    # row logsumexp including the dustbin column (one alpha per row)
    row_max = jnp.maximum(jnp.max(s, axis=1), alpha)  # (block_m,)
    row_sum = jnp.sum(jnp.exp(s - row_max[:, None]), axis=1) + jnp.exp(alpha - row_max)
    lse_row = jnp.log(row_sum) + row_max

    lse_col = lse_col_ref[0, 0]  # (N_pad,) — dustbin-augmented by the caller
    # softmax(axis=1) * softmax(axis=2) = exp(s - lse_col) * exp(s - lse_row)
    out_ref[0] = jnp.exp(s - lse_row[:, None]) * jnp.exp(s - lse_col[None, :])


@functools.partial(
    jax.jit, static_argnames=("temperature", "use_dustbin", "block_m", "interpret")
)
def fused_dual_softmax(
    dsc0: jnp.ndarray,  # (B, M, C) L2-normalized descriptors
    dsc1: jnp.ndarray,  # (B, N, C)
    dustbin: jnp.ndarray,  # scalar dustbin logit (ignored if not use_dustbin)
    temperature: float = 0.1,
    use_dustbin: bool = True,
    block_m: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, M, N) dual-softmax match scores, couplings never materialized."""
    B, M, C = dsc0.shape
    N = dsc1.shape[1]
    M_pad = _round_up(M, block_m)
    N_pad = _round_up(N, 128)
    C_pad = _round_up(C, 128)

    d0 = jnp.zeros((B, M_pad, C_pad), dsc0.dtype).at[:, :M, :C].set(dsc0)
    d1 = jnp.zeros((B, N_pad, C_pad), dsc1.dtype).at[:, :N, :C].set(dsc1)
    if use_dustbin:
        alpha = jnp.asarray(dustbin, jnp.float32).reshape(1, 1)
    else:
        alpha = jnp.full((1, 1), _NEG_INF, jnp.float32)
    inv_temp = float(1.0 / temperature)
    m_tiles = M_pad // block_m

    d0_spec = pl.BlockSpec(
        (1, block_m, C_pad), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM
    )
    d1_spec = pl.BlockSpec(
        (1, N_pad, C_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM
    )

    stats = pl.pallas_call(
        functools.partial(
            _col_stats_kernel, inv_temp=inv_temp, m_valid=M, n_valid=N, block_m=block_m
        ),
        grid=(B, m_tiles),
        in_specs=[d0_spec, d1_spec],
        out_specs=pl.BlockSpec(
            (1, 8, N_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, N_pad), jnp.float32),
        interpret=interpret,
    )(d0, d1)

    # column logsumexp + analytic dustbin row contribution
    lse_col = jnp.log(stats[:, 1, :]) + stats[:, 0, :]
    lse_col = jnp.logaddexp(lse_col, alpha[0, 0])[:, None, :]  # (B, 1, N_pad)

    out = pl.pallas_call(
        functools.partial(_pair_softmax_kernel, inv_temp=inv_temp, n_valid=N),
        grid=(B, m_tiles),
        in_specs=[
            d0_spec,
            d1_spec,
            pl.BlockSpec((1, 1, N_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, m: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_m, N_pad), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, M_pad, N_pad), jnp.float32),
        interpret=interpret,
    )(d0, d1, lse_col, alpha)

    return out[:, :M, :N]
