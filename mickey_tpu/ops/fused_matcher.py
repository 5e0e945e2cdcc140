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
matrix. Behavioral spec: reference ``feature_matcher.py:54-83``.

``fused_dual_softmax`` is forward-only (inference). ``fused_dual_softmax_vjp``
adds an analytic custom VJP so TRAINING can use the kernel too: with
A = softmax(axis=rows), B = softmax(axis=cols), P = A*B and upstream
cotangent G (zero on the dustbin row/col, which are cropped),

    dS = 2*P*G - A*colsum(G*P) - B*rowsum(G*P)
    d dsc0 = dS @ dsc1 / T,   d dsc1 = dS^T @ dsc0 / T
    d alpha = -sum_j exp(a - lse_col_j) c_j - sum_i exp(a - lse_row_i) r_i

(the dustbin entries of dS reduce to the closed forms above because G and
therefore c, r vanish on them). The backward recomputes the correlation in
two more streaming passes using the saved row/column logsumexps — the
coupling matrix never hits HBM in either direction. Formula validated
against jax.grad of the dense path (tests/test_fused_matcher.py).
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
    d0 = dsc0_ref[0]  # (block_m, C)
    d1 = dsc1_ref[0]  # (N_pad, C)
    if d0.dtype == jnp.bfloat16:
        # bf16 descriptor mode (cfg.TPU.MATCHER_BF16): the operands are
        # already rounded to bf16 upstream, so a single MXU pass with fp32
        # accumulation is exact for them — HIGHEST would only decompose the
        # same bf16 values into 3 passes for nothing. Halves descriptor VMEM
        # traffic and cuts correlation MXU work 3x; the resulting ~0.04
        # logit perturbation is gated at the pose/confidence level
        # (tests/test_fused_matcher.py::test_bf16_descriptor_gate).
        precision = jax.lax.Precision.DEFAULT
    else:
        # HIGHEST matches the dense path's precision (nn/matcher.py) — the
        # MXU default would truncate the f32 descriptors to bf16, and the
        # 1/T=10 scaling amplifies that into ~0.04 logit error
        d0 = d0.astype(jnp.float32)
        d1 = d1.astype(jnp.float32)
        precision = jax.lax.Precision.HIGHEST
    return (
        jax.lax.dot_general(
            d0, d1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
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
    dsc0_ref, dsc1_ref, lse_col_ref, alpha_ref, out_ref, lse_row_ref,
    *, inv_temp: float, n_valid: int
):
    """softmax(axis=1) * softmax(axis=2) of the implicit couplings, cropped."""
    m_i = pl.program_id(1)
    s = _corr_block(dsc0_ref, dsc1_ref, inv_temp)
    block_m = s.shape[0]
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
    # lse_row lives as a (1, M_pad) row (TPU block tiling: a (1, block_m)
    # block would violate the (8, 128) minimum); each m-block writes its slice
    lse_row_ref[0, 0, pl.ds(m_i * block_m, block_m)] = lse_row


def _pad_inputs(dsc0, dsc1, dustbin, use_dustbin, block_m):
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
    return d0, d1, alpha


def _specs(block_m, N_pad, C_pad):
    d0_spec = pl.BlockSpec(
        (1, block_m, C_pad), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM
    )
    d1_spec = pl.BlockSpec(
        (1, N_pad, C_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM
    )
    return d0_spec, d1_spec


def _forward_padded(d0, d1, alpha, inv_temp, M, N, block_m, interpret):
    """Padded-space forward. Returns (out (B, M_pad, N_pad), lse_row
    (B, M_pad), lse_col (B, 1, N_pad)); callers crop."""
    B, M_pad, C_pad = d0.shape
    N_pad = d1.shape[1]
    m_tiles = M_pad // block_m
    d0_spec, d1_spec = _specs(block_m, N_pad, C_pad)

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

    out, lse_row = pl.pallas_call(
        functools.partial(_pair_softmax_kernel, inv_temp=inv_temp, n_valid=N),
        grid=(B, m_tiles),
        in_specs=[
            d0_spec,
            d1_spec,
            pl.BlockSpec((1, 1, N_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, m: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, block_m, N_pad), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1, M_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M_pad, N_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, M_pad), jnp.float32),
        ],
        interpret=interpret,
    )(d0, d1, lse_col, alpha)
    return out, lse_row, lse_col


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
    """(B, M, N) dual-softmax match scores, couplings never materialized.

    Forward-only (inference). For the differentiable variant see
    ``fused_dual_softmax_vjp``.
    """
    M, N = dsc0.shape[1], dsc1.shape[1]
    d0, d1, alpha = _pad_inputs(dsc0, dsc1, dustbin, use_dustbin, block_m)
    out, _, _ = _forward_padded(
        d0, d1, alpha, float(1.0 / temperature), M, N, block_m, interpret
    )
    return out[:, :M, :N]


# -- backward ------------------------------------------------------------------


def _bwd_sums_kernel(
    dsc0_ref, dsc1_ref, g_ref, lse_row_ref, lse_col_ref, r_ref, c_ref,
    *, inv_temp: float, n_valid: int,
):
    """r = rowsum(G*P) per block; c = colsum(G*P) accumulated over M-blocks."""
    m_i = pl.program_id(1)
    s = _corr_block(dsc0_ref, dsc1_ref, inv_temp)
    block_m = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, _NEG_INF)
    lse_row = lse_row_ref[0, 0, pl.ds(m_i * block_m, block_m)]  # (block_m,)
    lse_col = lse_col_ref[0, 0]  # (N_pad,)
    gp = g_ref[0] * jnp.exp(2.0 * s - lse_row[:, None] - lse_col[None, :])
    r_ref[0, 0, pl.ds(m_i * block_m, block_m)] = jnp.sum(gp, axis=1)

    @pl.when(m_i == 0)
    def _():
        c_ref[0, 0, :] = jnp.zeros((s.shape[1],), jnp.float32)

    c_ref[0, 0, :] += jnp.sum(gp, axis=0)


def _bwd_grads_kernel(
    dsc0_ref, dsc1_ref, g_ref, lse_row_ref, lse_col_ref, r_ref, c_ref,
    dd0_ref, dd1_ref,
    *, inv_temp: float, n_valid: int,
):
    """dS = 2*P*G - A*c - B*r; dd0 block = dS @ d1; dd1 += dS^T @ d0."""
    m_i = pl.program_id(1)
    s = _corr_block(dsc0_ref, dsc1_ref, inv_temp)
    block_m = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, _NEG_INF)
    lse_row = lse_row_ref[0, 0, pl.ds(m_i * block_m, block_m)][:, None]
    lse_col = lse_col_ref[0, 0][None, :]
    A = jnp.exp(s - lse_col)  # column softmax
    Bm = jnp.exp(s - lse_row)  # row softmax
    G = g_ref[0]
    r = r_ref[0, 0, pl.ds(m_i * block_m, block_m)][:, None]
    dS = 2.0 * (A * Bm) * G - A * c_ref[0, 0][None, :] - Bm * r
    d1 = dsc1_ref[0].astype(jnp.float32)
    d0 = dsc0_ref[0].astype(jnp.float32)
    dd0_ref[0] = (
        jax.lax.dot_general(dS, d1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        * inv_temp
    )

    @pl.when(m_i == 0)
    def _():
        dd1_ref[0] = jnp.zeros_like(dd1_ref[0])

    dd1_ref[0] += (
        jax.lax.dot_general(dS, d0, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        * inv_temp
    )


def _make_vjp(temperature: float, use_dustbin: bool, block_m: int, interpret: bool):
    inv_temp = float(1.0 / temperature)

    @jax.custom_vjp
    def f(dsc0, dsc1, dustbin):
        return fused_dual_softmax(
            dsc0, dsc1, dustbin, temperature=temperature,
            use_dustbin=use_dustbin, block_m=block_m, interpret=interpret,
        )

    def fwd(dsc0, dsc1, dustbin):
        M, N = dsc0.shape[1], dsc1.shape[1]
        d0, d1, alpha = _pad_inputs(dsc0, dsc1, dustbin, use_dustbin, block_m)
        out, lse_row, lse_col = _forward_padded(
            d0, d1, alpha, inv_temp, M, N, block_m, interpret
        )
        return out[:, :M, :N], (dsc0, dsc1, alpha, lse_row, lse_col)

    def bwd(res, g):
        dsc0, dsc1, alpha, lse_row, lse_col = res
        B, M, C = dsc0.shape
        N = dsc1.shape[1]
        d0, d1, _ = _pad_inputs(dsc0, dsc1, alpha, True, block_m)
        M_pad, N_pad, C_pad = d0.shape[1], d1.shape[1], d0.shape[2]
        m_tiles = M_pad // block_m
        gp = jnp.zeros((B, M_pad, N_pad), jnp.float32).at[:, :M, :N].set(g)

        d0_spec, d1_spec = _specs(block_m, N_pad, C_pad)
        g_spec = pl.BlockSpec(
            (1, block_m, N_pad), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM
        )
        # lse_row / r ride as full (1, M_pad) rows; kernels slice their block
        lse_row_spec = pl.BlockSpec(
            (1, 1, M_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM
        )
        lse_col_spec = pl.BlockSpec(
            (1, 1, N_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM
        )

        r, c = pl.pallas_call(
            functools.partial(_bwd_sums_kernel, inv_temp=inv_temp, n_valid=N),
            grid=(B, m_tiles),
            in_specs=[d0_spec, d1_spec, g_spec, lse_row_spec, lse_col_spec],
            out_specs=[
                lse_row_spec,
                pl.BlockSpec((1, 1, N_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, 1, M_pad), jnp.float32),
                jax.ShapeDtypeStruct((B, 1, N_pad), jnp.float32),
            ],
            interpret=interpret,
        )(d0, d1, gp, lse_row, lse_col)

        dd0, dd1 = pl.pallas_call(
            functools.partial(_bwd_grads_kernel, inv_temp=inv_temp, n_valid=N),
            grid=(B, m_tiles),
            in_specs=[
                d0_spec, d1_spec, g_spec, lse_row_spec, lse_col_spec,
                lse_row_spec,  # r has the same layout as lse_row
                pl.BlockSpec((1, 1, N_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                d0_spec,
                pl.BlockSpec((1, N_pad, C_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, M_pad, C_pad), jnp.float32),
                jax.ShapeDtypeStruct((B, N_pad, C_pad), jnp.float32),
            ],
            interpret=interpret,
        )(d0, d1, gp, lse_row, lse_col, r, c)

        if use_dustbin:
            a = alpha[0, 0]
            # closed-form dustbin row/col contributions (G vanishes there)
            da = -jnp.sum(jnp.exp(a - lse_col[:, 0, :N]) * c[:, 0, :N]) - jnp.sum(
                jnp.exp(a - lse_row[:, 0, :M]) * r[:, 0, :M]
            )
            dalpha = da.astype(jnp.float32)
        else:
            dalpha = jnp.zeros((), jnp.float32)
        return (
            dd0[:, :M, :C].astype(dsc0.dtype),
            dd1[:, :N, :C].astype(dsc1.dtype),
            dalpha,
        )

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=16)
def _vjp_cache(temperature, use_dustbin, block_m, interpret):
    return _make_vjp(temperature, use_dustbin, block_m, interpret)


def fused_dual_softmax_vjp(
    dsc0, dsc1, dustbin, temperature: float = 0.1, use_dustbin: bool = True,
    block_m: int = 256, interpret: bool = False,
):
    """Differentiable fused dual-softmax: Pallas forward AND analytic Pallas
    backward (module docstring). Gradients flow to dsc0, dsc1 and the dustbin
    logit — the full set the training loss needs (reference
    feature_matcher.py:54-83 under autograd)."""
    f = _vjp_cache(float(temperature), bool(use_dustbin), int(block_m), bool(interpret))
    return f(dsc0, dsc1, jnp.asarray(dustbin, jnp.float32))


# -- fused matcher -> top-K ------------------------------------------------------
#
# The inference solver consumes the (B, N0, N1) final score matrix ONLY through
# a top-`prefilter` reduction (solver/procrustes_ransac.py:121-131 — the
# sampling table) plus a validity reduction. The dense fp32 matrix
# (~16 MB/pair) therefore exists solely to be written by the matcher and
# re-read by approx_max_k — the two largest non-backbone HBM costs at the
# benchmark operating point (BENCHLOG round-3 headroom #1-2; reference
# behavior being beaten: feature_matcher.py:54-83 writes the dense matrix,
# probabilisticProcrustes.py:230-241 multinomial-samples it).
#
# `fused_topk_scores` keeps pass 1 (column stats) and replaces pass 2's dense
# output with an in-VMEM per-row top-L selection of the FINAL scores
# (dual-softmax * detection-score outer product): each (block_m, N_pad) score
# block is reduced to L (value, global index) pairs per row via L
# max/first-index/mask rounds, and only (B, L, M_pad) values + indices
# (~128 KB/pair at L=8) ever reach HBM. Tiny XLA glue then takes the exact
# top-P of the L*M_pad candidates (P = the solver prefilter). The candidate
# set misses a true global top-P entry only when one query keypoint holds
# more than L of the global top-P matches — rarer than the 0.95 recall target
# the approx_max_k prefilter already accepts (recall measured in
# tests/test_fused_matcher.py).
#
# Validity (the solver's row_ok: all-finite, nonnegative, positive mass —
# reference loss_class.py:127-131) is accumulated in-kernel: per-batch total
# mass, non-finite count and minimum over the valid region.


def _pair_topk_kernel(
    dsc0_ref, dsc1_ref, scr0_ref, scr1_ref, lse_col_ref, alpha_ref,
    vals_ref, idxs_ref, stats_ref, lse_row_ref,
    *, inv_temp: float, m_valid: int, n_valid: int, block_m: int, topl: int, n1: int,
):
    """Per-row top-L of dual_softmax * (scr0 x scr1), block-resident."""
    m_i = pl.program_id(1)
    s = _corr_block(dsc0_ref, dsc1_ref, inv_temp)  # (block_m, N_pad)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + m_i * block_m
    s = jnp.where(col < n_valid, s, _NEG_INF)

    alpha = alpha_ref[0, 0]
    row_max = jnp.maximum(jnp.max(s, axis=1), alpha)
    row_sum = jnp.sum(jnp.exp(s - row_max[:, None]), axis=1) + jnp.exp(alpha - row_max)
    lse_row = jnp.log(row_sum) + row_max
    # emitted for the TRAINING route (fused_topk_scores_train): log of a
    # sampled final score is linear in (s, lse_row, lse_col), so the
    # REINFORCE surrogate only needs these two logsumexps grad-carrying —
    # never the dense matrix. Costs one (1, M_pad) row write per block.
    lse_row_ref[0, 0, pl.ds(m_i * block_m, block_m)] = lse_row
    lse_col = lse_col_ref[0, 0]  # (N_pad,) dustbin-augmented

    # final score block: softmax(axis=1)*softmax(axis=2) * kp outer product
    p = jnp.exp(s - lse_row[:, None]) * jnp.exp(s - lse_col[None, :])
    scr0 = scr0_ref[0, 0, pl.ds(m_i * block_m, block_m)]  # (block_m,)
    scr1 = scr1_ref[0, 0]  # (N_pad,)
    f = p * scr0[:, None] * scr1[None, :]

    valid = (row < m_valid) & (col < n_valid)
    fv = jnp.where(valid, f, 0.0)

    # validity stats accumulated column-wise over the M-blocks (same revisited
    # -block pattern as _col_stats_kernel); the caller reduces over columns.
    @pl.when(m_i == 0)
    def _():
        stats_ref[0, 0, :] = jnp.zeros((s.shape[1],), jnp.float32)
        stats_ref[0, 1, :] = jnp.zeros((s.shape[1],), jnp.float32)
        stats_ref[0, 2, :] = jnp.full((s.shape[1],), jnp.inf, jnp.float32)

    stats_ref[0, 0, :] += jnp.sum(fv, axis=0)  # mass
    stats_ref[0, 1, :] += jnp.sum(
        jnp.where(valid & ~jnp.isfinite(f), 1.0, 0.0), axis=0
    )  # non-finite count
    stats_ref[0, 2, :] = jnp.minimum(
        stats_ref[0, 2, :], jnp.min(jnp.where(valid, f, jnp.inf), axis=0)
    )

    # top-L via L rounds of (max, first-max-index, mask). Scores are
    # nonnegative, so -1 sentinels on invalid entries are never selected
    # ahead of a valid entry; fully-invalid (padded) rows yield value -1,
    # clamped to 0 below => excluded from sampling by the solver's
    # scores > 0 guard (_log_weights).
    sel = jnp.where(valid, f, -1.0)
    big = jnp.int32(2**30)
    grow = jnp.minimum(row[:, 0], m_valid - 1)  # (block_m,) global row index
    for l in range(topl):
        m = jnp.max(sel, axis=1)  # (block_m,)
        # first index attaining the max (argmax semantics, Mosaic-friendly)
        idx = jnp.min(jnp.where(sel == m[:, None], col, big), axis=1)
        idx = jnp.minimum(idx, n_valid - 1)  # NaN rows: sel==m nowhere
        vals_ref[0, l, pl.ds(m_i * block_m, block_m)] = jnp.maximum(m, 0.0)
        idxs_ref[0, l, pl.ds(m_i * block_m, block_m)] = grow * n1 + idx
        sel = jnp.where(col == idx[:, None], -jnp.inf, sel)


def _exact_topk_desc(vals: jnp.ndarray, k: int):
    """Exact descending top-k over the last axis: (values, positions).

    lax.top_k with k in the thousands is pathologically slow on TPU; a full
    descending argsort + slice is ~2x faster once k is a sizable fraction of N
    (tools/bench_topk.py, same trade as ops/sampling.gumbel_topk_sample)."""
    n = vals.shape[-1]
    if k >= n:
        order = jnp.argsort(-vals, axis=-1)
        return jnp.take_along_axis(vals, order, axis=-1), order.astype(jnp.int32)
    if 4 * k >= n:
        order = jnp.argsort(-vals, axis=-1)[..., :k]
        return jnp.take_along_axis(vals, order, axis=-1), order.astype(jnp.int32)
    v, i = jax.lax.top_k(vals, k)
    return v, i.astype(jnp.int32)


def _topk_candidates(
    dsc0, dsc1, scr0, scr1, dustbin,
    temperature, use_dustbin, row_topl, block_m, interpret,
):
    """Kernel stage of ``fused_topk_scores``: per-row top-L candidate table.

    Returns (cand_v (B, L*M_pad) fp32, cand_i (B, L*M_pad) int32 flat indices,
    row_ok (B,) validity, lse_row (B, 1, M_pad), lse_col (B, 1, N_pad)).
    Exposed separately so stage benches (tools/bench_fused_stage.py) can time
    the kernels apart from the final top-P selection."""
    B, M, C = dsc0.shape
    N = dsc1.shape[1]
    d0, d1, alpha = _pad_inputs(dsc0, dsc1, dustbin, use_dustbin, block_m)
    M_pad, N_pad, C_pad = d0.shape[1], d1.shape[1], d0.shape[2]
    m_tiles = M_pad // block_m
    inv_temp = float(1.0 / temperature)

    s0 = jnp.zeros((B, 1, M_pad), jnp.float32).at[:, 0, :M].set(scr0.astype(jnp.float32))
    s1 = jnp.zeros((B, 1, N_pad), jnp.float32).at[:, 0, :N].set(scr1.astype(jnp.float32))

    d0_spec, d1_spec = _specs(block_m, N_pad, C_pad)
    stats = pl.pallas_call(
        functools.partial(
            _col_stats_kernel, inv_temp=inv_temp, m_valid=M, n_valid=N, block_m=block_m
        ),
        grid=(B, m_tiles),
        in_specs=[d0_spec, d1_spec],
        out_specs=pl.BlockSpec((1, 8, N_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, N_pad), jnp.float32),
        interpret=interpret,
    )(d0, d1)
    lse_col = jnp.log(stats[:, 1, :]) + stats[:, 0, :]
    lse_col = jnp.logaddexp(lse_col, alpha[0, 0])[:, None, :]

    vals, idxs, vstats, lse_row = pl.pallas_call(
        functools.partial(
            _pair_topk_kernel, inv_temp=inv_temp, m_valid=M, n_valid=N,
            block_m=block_m, topl=row_topl, n1=N,
        ),
        grid=(B, m_tiles),
        in_specs=[
            d0_spec,
            d1_spec,
            pl.BlockSpec((1, 1, M_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, m: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, row_topl, M_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, row_topl, M_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, N_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, row_topl, M_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, row_topl, M_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, 8, N_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, M_pad), jnp.float32),
        ],
        interpret=interpret,
    )(d0, d1, s0, s1, lse_col, alpha)

    row_ok = (
        (jnp.sum(vstats[:, 1, :], axis=-1) == 0.0)  # all finite
        & (jnp.min(vstats[:, 2, :], axis=-1) >= 0.0)  # nonnegative
        & (jnp.sum(vstats[:, 0, :], axis=-1) > 0.0)  # positive mass
    )

    cand_v = vals.reshape(B, row_topl * M_pad)
    cand_i = idxs.reshape(B, row_topl * M_pad)
    return cand_v, cand_i, row_ok, lse_row, lse_col


@functools.partial(
    jax.jit,
    static_argnames=(
        "prefilter", "temperature", "use_dustbin", "row_topl", "block_m",
        "interpret", "select",
    ),
)
def fused_topk_scores(
    dsc0: jnp.ndarray,  # (B, M, C) L2-normalized descriptors
    dsc1: jnp.ndarray,  # (B, N, C)
    scr0: jnp.ndarray,  # (B, M) detection scores
    scr1: jnp.ndarray,  # (B, N)
    dustbin: jnp.ndarray,
    prefilter: int,
    temperature: float = 0.1,
    use_dustbin: bool = True,
    row_topl: int = 8,
    block_m: int = 256,
    interpret: bool = False,
    select: str = "exact",
):
    """Top-`prefilter` entries of dual_softmax(dsc0,dsc1) * (scr0 x scr1).

    Returns (top_scores (B, P) fp32 desc-sorted, top_idx (B, P) int32 flat
    indices into the M x N final-score matrix, row_ok (B,) bool validity).
    The dense matrix never materializes in HBM (see block comment above).

    ``select``: final reduction over the L*M_pad candidates — "exact"
    (descending sort semantics) or "approx" (jax.lax.approx_max_k,
    recall_target=0.95). NOTE the approx variant runs over the L*M_pad
    candidate table, NOT the full M x N matrix the dense route's prefilter
    reduces (solver/procrustes_ransac.py:126): its misses compound with the
    kernel's per-row top-L truncation, so its recall profile differs from the
    dense route's. Bench-only; production uses "exact" (the default)."""
    cand_v, cand_i, row_ok, _, _ = _topk_candidates(
        dsc0, dsc1, scr0, scr1, dustbin,
        temperature, use_dustbin, row_topl, block_m, interpret,
    )
    if select == "approx" and not interpret:
        top_scores, pos = jax.lax.approx_max_k(cand_v, prefilter, recall_target=0.95)
        pos = pos.astype(jnp.int32)
    else:
        top_scores, pos = _exact_topk_desc(cand_v, prefilter)
    top_idx = jnp.take_along_axis(cand_i, pos, axis=-1)
    return top_scores, top_idx, row_ok


# -- fused matcher -> top-K for TRAINING ------------------------------------------
#
# The REINFORCE surrogate (training/loss.py) needs two things from the
# matcher: (a) a sampling table of the largest final scores (detached — the
# reference's torch.multinomial weights, loss_class.py:136-159) and (b) the
# GRADIENT of log(final_score) at the sampled entries. With
# P_ij = exp(2 s_ij - lse_row_i - lse_col_j) (dual-softmax product) and
# final_ij = P_ij * scr0_i * scr1_j,
#
#     log final_ij = 2 s_ij - lse_row_i - lse_col_j + log scr0_i + log scr1_j
#
# is LINEAR in the correlation logit s_ij and the two logsumexps — so the
# dense (B, N0, N1) matrix is needed in NEITHER direction: the loss gathers
# descriptor rows at the sampled indices (tiny) and differentiates through
# grad-carrying lse_row/lse_col. Their VJP is one streaming Pallas pass:
# given cotangents gr (B, M), gc (B, N),
#
#     dS_ij  = gr_i * exp(s_ij - lse_row_i) + gc_j * exp(s_ij - lse_col_j)
#     d dsc0 = dS @ dsc1 / T,   d dsc1 = dS^T @ dsc0 / T
#     d alpha = sum_i gr_i exp(a - lse_row_i) + sum_j gc_j exp(a - lse_col_j)
#
# (row softmax incl. the dustbin column / col softmax incl. the dustbin row —
# the closed forms because the dustbin entries carry no cotangent of their
# own). Versus the dense training route (fused_dual_softmax_vjp output *
# kp-score outer product -> metric_pose_loss), this removes the (B, N0, N1)
# match matrix, the kp_scores outer product, the final_scores product AND
# their backward cotangents from HBM entirely.


def _lse_bwd_kernel(
    dsc0_ref, dsc1_ref, gr_ref, gc_ref, lse_row_ref, lse_col_ref,
    dd0_ref, dd1_ref,
    *, inv_temp: float, n_valid: int,
):
    """dS = gr*exp(s-lse_row) + gc*exp(s-lse_col); dd0/dd1 like _bwd_grads."""
    m_i = pl.program_id(1)
    s = _corr_block(dsc0_ref, dsc1_ref, inv_temp)
    block_m = s.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, _NEG_INF)
    lse_row = lse_row_ref[0, 0, pl.ds(m_i * block_m, block_m)][:, None]
    lse_col = lse_col_ref[0, 0][None, :]
    gr = gr_ref[0, 0, pl.ds(m_i * block_m, block_m)][:, None]
    gc = gc_ref[0, 0][None, :]
    # padded rows: gr = 0 kills the first term; the second term leaves
    # garbage only in dd0 rows >= M (cropped by the caller) and cannot reach
    # dd1 because the padded dsc0 rows are zero.
    dS = gr * jnp.exp(s - lse_row) + gc * jnp.exp(s - lse_col)
    d1 = dsc1_ref[0].astype(jnp.float32)
    d0 = dsc0_ref[0].astype(jnp.float32)
    dd0_ref[0] = (
        jax.lax.dot_general(dS, d1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        * inv_temp
    )

    @pl.when(m_i == 0)
    def _():
        dd1_ref[0] = jnp.zeros_like(dd1_ref[0])

    dd1_ref[0] += (
        jax.lax.dot_general(dS, d0, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        * inv_temp
    )


def _make_topk_train(prefilter, temperature, use_dustbin, row_topl, block_m, interpret):
    inv_temp = float(1.0 / temperature)

    def fwd(dsc0, dsc1, scr0, scr1, dustbin):
        M, N = dsc0.shape[1], dsc1.shape[1]
        # the table INCLUDES the detection-score outer product (the sampling
        # distribution is over final scores — reference loss_class.py:136);
        # scr enter detached — their gradient flows through the loss's
        # explicit log scr terms, not the kernel
        cand_v, cand_i, row_ok, lse_row, lse_col = _topk_candidates(
            dsc0, dsc1,
            jax.lax.stop_gradient(scr0), jax.lax.stop_gradient(scr1), dustbin,
            temperature, use_dustbin, row_topl, block_m, interpret,
        )
        top_scores, pos = _exact_topk_desc(cand_v, prefilter)
        top_idx = jnp.take_along_axis(cand_i, pos, axis=-1)
        out = (
            top_scores,
            top_idx,
            row_ok,
            lse_row[:, 0, :M],
            lse_col[:, 0, :N],
        )
        return out, (dsc0, dsc1, jnp.asarray(dustbin, jnp.float32), lse_row, lse_col)

    @jax.custom_vjp
    def f(dsc0, dsc1, scr0, scr1, dustbin):
        return fwd(dsc0, dsc1, scr0, scr1, dustbin)[0]

    def bwd(res, cts):
        dsc0, dsc1, dustbin, lse_row_pad, lse_col_pad = res
        _, _, _, gr, gc = cts  # cotangents only flow into the logsumexps
        B, M, C = dsc0.shape
        N = dsc1.shape[1]
        d0, d1, alpha = _pad_inputs(dsc0, dsc1, dustbin, use_dustbin, block_m)
        M_pad, N_pad, C_pad = d0.shape[1], d1.shape[1], d0.shape[2]
        m_tiles = M_pad // block_m
        grp = jnp.zeros((B, 1, M_pad), jnp.float32).at[:, 0, :M].set(gr)
        gcp = jnp.zeros((B, 1, N_pad), jnp.float32).at[:, 0, :N].set(gc)

        d0_spec, d1_spec = _specs(block_m, N_pad, C_pad)
        row_vec = pl.BlockSpec((1, 1, M_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM)
        col_vec = pl.BlockSpec((1, 1, N_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM)

        dd0, dd1 = pl.pallas_call(
            functools.partial(_lse_bwd_kernel, inv_temp=inv_temp, n_valid=N),
            grid=(B, m_tiles),
            in_specs=[d0_spec, d1_spec, row_vec, col_vec, row_vec, col_vec],
            out_specs=[
                d0_spec,
                pl.BlockSpec((1, N_pad, C_pad), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, M_pad, C_pad), jnp.float32),
                jax.ShapeDtypeStruct((B, N_pad, C_pad), jnp.float32),
            ],
            interpret=interpret,
        )(d0, d1, grp, gcp, lse_row_pad, lse_col_pad)

        if use_dustbin:
            a = alpha[0, 0]
            dalpha = (
                jnp.sum(gr * jnp.exp(a - lse_row_pad[:, 0, :M]))
                + jnp.sum(gc * jnp.exp(a - lse_col_pad[:, 0, :N]))
            ).astype(jnp.float32)
        else:
            dalpha = jnp.zeros((), jnp.float32)
        return (
            dd0[:, :M, :C].astype(dsc0.dtype),
            dd1[:, :N, :C].astype(dsc1.dtype),
            jnp.zeros((dsc0.shape[0], M), jnp.float32),  # scr0: detached here
            jnp.zeros((dsc1.shape[0], N), jnp.float32),  # scr1: detached here
            dalpha,
        )

    def fwd_rule(dsc0, dsc1, scr0, scr1, dustbin):
        return fwd(dsc0, dsc1, scr0, scr1, dustbin)

    f.defvjp(fwd_rule, bwd)
    return f


@functools.lru_cache(maxsize=16)
def _topk_train_cache(prefilter, temperature, use_dustbin, row_topl, block_m, interpret):
    return _make_topk_train(prefilter, temperature, use_dustbin, row_topl, block_m, interpret)


def fused_topk_scores_train(
    dsc0: jnp.ndarray,  # (B, M, C) L2-normalized descriptors
    dsc1: jnp.ndarray,  # (B, N, C)
    scr0: jnp.ndarray,  # (B, M) detection scores
    scr1: jnp.ndarray,  # (B, N)
    dustbin: jnp.ndarray,
    prefilter: int,
    temperature: float = 0.1,
    use_dustbin: bool = True,
    row_topl: int = 8,
    block_m: int = 256,
    interpret: bool = False,
):
    """Training route of the fused matcher->top-K (block comment above).

    Returns (top_scores (B, P) DETACHED final scores descending — the same
    sampling table as ``fused_topk_scores`` —, top_idx (B, P) int32 flat
    indices, row_ok (B,) validity, lse_row (B, M) grad-carrying, lse_col
    (B, N) grad-carrying). scr0/scr1 enter the table detached; their
    gradients flow through the loss's explicit log terms
    (training/loss.py::metric_pose_loss_topk)."""
    f = _topk_train_cache(
        int(prefilter), float(temperature), bool(use_dustbin), int(row_topl),
        int(block_m), bool(interpret),
    )
    return f(dsc0, dsc1, scr0, scr1, jnp.asarray(dustbin, jnp.float32))


def dense_lse(dsc0, dsc1, dustbin, temperature: float, use_dustbin: bool):
    """XLA reference of the grad-carrying logsumexps (CPU fallback + test
    oracle for ``fused_topk_scores_train``): lse over the dustbin-augmented
    correlation rows/columns. Differentiable by ordinary autodiff."""
    s = (
        jnp.einsum(
            "bmc,bnc->bmn", dsc0.astype(jnp.float32), dsc1.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        / temperature
    )
    lse_row = jax.nn.logsumexp(s, axis=2)  # (B, M)
    lse_col = jax.nn.logsumexp(s, axis=1)  # (B, N)
    if use_dustbin:
        a = jnp.asarray(dustbin, jnp.float32)
        lse_row = jnp.logaddexp(lse_row, a)
        lse_col = jnp.logaddexp(lse_col, a)
    return lse_row, lse_col


def dense_topk_scores_train(
    dsc0, dsc1, scr0, scr1, dustbin, prefilter: int,
    temperature: float = 0.1, use_dustbin: bool = True, row_topl: int = 8,
):
    """CPU fallback of ``fused_topk_scores_train``: same five outputs from
    the dense dual-softmax product (table detached, logsumexps autodiff)."""
    lse_row, lse_col = dense_lse(dsc0, dsc1, dustbin, temperature, use_dustbin)
    s = (
        jnp.einsum(
            "bmc,bnc->bmn", dsc0.astype(jnp.float32), dsc1.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        / temperature
    )
    p = jnp.exp(2.0 * s - lse_row[:, :, None] - lse_col[:, None, :])
    final = p * scr0[:, :, None] * scr1[:, None, :]
    top_scores, top_idx, row_ok = dense_topk_scores(
        jax.lax.stop_gradient(final), prefilter, row_topl=row_topl
    )
    return top_scores, top_idx, row_ok, lse_row, lse_col


def dense_topk_scores(
    scores: jnp.ndarray,  # (B, M, N) dense FINAL scores
    prefilter: int,
    row_topl: int = 8,
):
    """XLA reference of ``fused_topk_scores``' selection semantics on a dense
    matrix (CPU fallback + test oracle): per-row top-L candidates, then exact
    top-P. Validity matches the solver's dense row_ok."""
    B, M, N = scores.shape
    flat = scores.reshape(B, M * N).astype(jnp.float32)
    row_ok = (
        jnp.all(jnp.isfinite(flat), axis=-1)
        & jnp.all(flat >= 0, axis=-1)
        & (jnp.sum(flat, axis=-1) > 0)
    )
    s = jnp.where(jnp.isfinite(scores), scores.astype(jnp.float32), -1.0)
    v, i = jax.lax.top_k(s, row_topl)  # (B, M, L)
    gidx = jnp.arange(M, dtype=jnp.int32)[None, :, None] * N + i.astype(jnp.int32)
    cand_v = jnp.maximum(v, 0.0).transpose(0, 2, 1).reshape(B, row_topl * M)
    cand_i = gidx.transpose(0, 2, 1).reshape(B, row_topl * M)
    top_scores, pos = _exact_topk_desc(cand_v, prefilter)
    top_idx = jnp.take_along_axis(cand_i, pos, axis=-1)
    return top_scores, top_idx, row_ok
