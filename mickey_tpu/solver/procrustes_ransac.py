"""Probabilistic Procrustes RANSAC — TPU-native inference pose solver.

Behavioral counterpart of the reference ``e2eProbabilisticProcrustesSolver``
(``modules/utils/probabilisticProcrustes.py``), redesigned for XLA:

  * ``torch.multinomial`` two-level sampling -> Gumbel top-k on log-scores
    (exact without-replacement sampling, explicit PRNG keys);
  * the B x it_matches x it_RANSAC hypothesis tensor never materializes:
    a ``lax.scan`` over the it_matches outer draws keeps per-step memory at
    (B, it_RANSAC, num_samples) while a per-step argmax + a final argmax over
    steps reproduces the global best-hypothesis selection;
  * the data-dependent refinement early-exit (reference :287-300, an
    ``.item()`` host sync) becomes a fixed-trip masked ``fori_loop``;
  * try/except NaN handling (reference :228,331) becomes a per-element
    validity mask with the same zero-pose fallback — per *element* rather
    than per batch, which strictly dominates the reference behavior.

All shapes static; jit-compiled once per (B, N0, N1, config).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import (
    backproject_3d,
    inlier_counting_3d,
    soft_inlier_counting_3d,
    weighted_procrustes,
)
from ..ops.hypothesis_scoring import hypothesis_scores
from ..ops.sampling import gumbel_topk_sample, gumbel_topk_sample_draws

_NEG_INF = -1e30


class PoseEstimate(NamedTuple):
    R: jnp.ndarray  # (B, 3, 3)
    t: jnp.ndarray  # (B, 1, 3)
    confidence: jnp.ndarray  # (B,) soft-inlier count of the best hypothesis
    valid: jnp.ndarray  # (B,) bool
    # Best correspondence subset (for inlier export / visualization):
    cor0: jnp.ndarray  # (B, S, 2)
    cor1: jnp.ndarray  # (B, S, 2)
    d0: jnp.ndarray  # (B, S, 1)
    d1: jnp.ndarray  # (B, S, 1)
    weights: jnp.ndarray  # (B, S)
    inlier_mask: jnp.ndarray  # (B, S) hard inliers at th_inlier under final pose


def _log_weights(scores: jnp.ndarray, eps: float = 1e-30) -> jnp.ndarray:
    return jnp.where(scores > 0, jnp.log(jnp.maximum(scores, eps)), _NEG_INF)


@functools.partial(
    jax.jit,
    static_argnames=(
        "it_matches",
        "it_ransac",
        "num_samples",
        "num_corr",
        "num_refinements",
        "th_inlier",
        "th_soft_inlier",
        "approx_sampling",
        "prefilter",
        "use_pallas_scoring",
        "pallas_interpret",
    ),
)
def estimate_pose(
    key: jax.Array,
    final_scores: jnp.ndarray,  # (B, N0, N1)
    kps0: jnp.ndarray,  # (B, N0, 2)
    depth0: jnp.ndarray,  # (B, N0, 1)
    kps1: jnp.ndarray,  # (B, N1, 2)
    depth1: jnp.ndarray,  # (B, N1, 1)
    K0: jnp.ndarray,  # (B, 3, 3)
    K1: jnp.ndarray,  # (B, 3, 3)
    it_matches: int = 20,
    it_ransac: int = 100,
    num_samples: int = 2048,
    num_corr: int = 3,
    num_refinements: int = 4,
    th_inlier: float = 0.15,
    th_soft_inlier: float = 0.3,
    approx_sampling: bool = False,
    prefilter: int = 0,
    use_pallas_scoring: bool = False,
    pallas_interpret: bool = False,
) -> PoseEstimate:
    """Metric relative pose from soft correspondence scores.

    Reference: estimate_pose_vectorized (probabilisticProcrustes.py:183-348)
    with config defaults from PROCRUSTES.* (curriculum_learning.yaml:89-96).

    prefilter > 0 enables two-stage sampling: the N0*N1 score matrix is
    reduced ONCE to its top-`prefilter` entries and the it_matches
    independent draws sample from that subset. The dual-softmax match
    distribution is extremely peaked (the tail of ~1e-12 scores carries
    negligible mass), so the sampling distribution is statistically
    unchanged while the dominant cost — it_matches sorts over millions of
    categories — collapses to one. prefilter=0 keeps the exact reference
    distribution.
    """
    B, N0, N1 = final_scores.shape
    scores_flat = final_scores.reshape(B, N0 * N1).astype(jnp.float32)

    # Validity of the sampling distribution (reference loss_class.py:127-129
    # try/except guard): finite, nonnegative, positive mass.
    row_ok = (
        jnp.all(jnp.isfinite(scores_flat), axis=-1)
        & jnp.all(scores_flat >= 0, axis=-1)
        & (jnp.sum(scores_flat, axis=-1) > 0)
    )

    if prefilter and prefilter < N0 * N1:
        # approx_max_k: the TPU-native large-k top-K (exact lax.top_k with
        # k~16K over millions of categories is pathologically slow on TPU).
        # recall_target=0.95 on an already-conservative prefilter leaves the
        # sampling distribution statistically unchanged.
        top_scores, top_idx = jax.lax.approx_max_k(scores_flat, prefilter, recall_target=0.95)
        logw = _log_weights(top_scores)  # (B, prefilter)
        remap = top_idx.astype(jnp.int32)  # (B, prefilter)
        w_table = top_scores
    else:
        logw = _log_weights(scores_flat)
        remap = None
        w_table = scores_flat

    return _solve_sampled(
        key, logw, remap, w_table, row_ok, kps0, depth0, kps1, depth1, K0, K1,
        n1=N1, it_matches=it_matches, it_ransac=it_ransac,
        num_samples=num_samples, num_corr=num_corr,
        num_refinements=num_refinements, th_inlier=th_inlier,
        th_soft_inlier=th_soft_inlier, approx_sampling=approx_sampling,
        use_pallas_scoring=use_pallas_scoring, pallas_interpret=pallas_interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n1",
        "it_matches",
        "it_ransac",
        "num_samples",
        "num_corr",
        "num_refinements",
        "th_inlier",
        "th_soft_inlier",
        "approx_sampling",
        "use_pallas_scoring",
        "pallas_interpret",
    ),
)
def estimate_pose_topk(
    key: jax.Array,
    top_scores: jnp.ndarray,  # (B, P) prefiltered final scores, desc-sorted
    top_idx: jnp.ndarray,  # (B, P) int32 flat indices into the N0 x N1 matrix
    row_ok: jnp.ndarray,  # (B,) sampling-distribution validity
    kps0: jnp.ndarray,  # (B, N0, 2)
    depth0: jnp.ndarray,  # (B, N0, 1)
    kps1: jnp.ndarray,  # (B, N1, 2)
    depth1: jnp.ndarray,  # (B, N1, 1)
    K0: jnp.ndarray,
    K1: jnp.ndarray,
    n1: int,
    it_matches: int = 20,
    it_ransac: int = 100,
    num_samples: int = 2048,
    num_corr: int = 3,
    num_refinements: int = 4,
    th_inlier: float = 0.15,
    th_soft_inlier: float = 0.3,
    approx_sampling: bool = False,
    use_pallas_scoring: bool = False,
    pallas_interpret: bool = False,
) -> PoseEstimate:
    """``estimate_pose`` on a PRE-REDUCED top-K score table.

    Entry point for the fused matcher->top-K path
    (ops/fused_matcher.fused_topk_scores): the dense (B, N0, N1) fp32 score
    matrix — written by the matcher and re-read by approx_max_k in the dense
    route, the two largest non-backbone HBM costs — never exists. The caller
    supplies the top-P (score, flat-index) table and the validity bits the
    fused kernel accumulated in VMEM; sampling proceeds identically to the
    prefiltered dense path (same Gumbel draws over the same distribution).
    Reference behavior being beaten: feature_matcher.py:54-83 +
    probabilisticProcrustes.py:230-241.
    """
    return _solve_sampled(
        key,
        _log_weights(top_scores.astype(jnp.float32)),
        top_idx.astype(jnp.int32),
        top_scores.astype(jnp.float32),
        row_ok,
        kps0, depth0, kps1, depth1, K0, K1,
        n1=n1, it_matches=it_matches, it_ransac=it_ransac,
        num_samples=num_samples, num_corr=num_corr,
        num_refinements=num_refinements, th_inlier=th_inlier,
        th_soft_inlier=th_soft_inlier, approx_sampling=approx_sampling,
        use_pallas_scoring=use_pallas_scoring, pallas_interpret=pallas_interpret,
    )


def _solve_sampled(
    key,
    logw,  # (B, P) log sampling weights (prefiltered table or dense-flat)
    remap,  # (B, P) int32 flat indices into the N0 x N1 matrix, or None
    w_table,  # (B, P) score values aligned with logw
    row_ok,  # (B,)
    kps0, depth0, kps1, depth1, K0, K1,
    *,
    n1,
    it_matches,
    it_ransac,
    num_samples,
    num_corr,
    num_refinements,
    th_inlier,
    th_soft_inlier,
    approx_sampling,
    use_pallas_scoring,
    pallas_interpret,
) -> PoseEstimate:
    """Sampling + RANSAC + refinement core shared by the dense and top-K
    entry points (reference estimate_pose_vectorized,
    probabilisticProcrustes.py:183-348, from the multinomial draws on)."""
    B = logw.shape[0]
    N1 = n1
    kps0 = kps0.astype(jnp.float32)
    kps1 = kps1.astype(jnp.float32)
    depth0 = depth0.astype(jnp.float32)
    depth1 = depth1.astype(jnp.float32)
    K0 = K0.astype(jnp.float32)
    K1 = K1.astype(jnp.float32)

    # -- 3D point tables, computed ONCE on the N keypoints per image.
    # Backprojection is per-point elementwise, so gather(backproject(kps)) ==
    # backproject(gather(kps)) bitwise — but runs on N ~ 2K points instead of
    # it*S ~ 41K sampled rows, and the per-draw scan body then gathers ONE
    # 3-wide table per side instead of two kps/depth tables + a backproject.
    # The gather stage was the solver's largest compute block (22.3 of ~67 ms
    # compute/batch-16, tools/bench_solver_micro.py).
    X_all = backproject_3d(kps0, depth0, K0)  # (B, N0, 3)
    Y_all = backproject_3d(kps1, depth1, K1)  # (B, N1, 3)

    k_outer, k_inner_base = jax.random.split(key)
    inner_keys = jax.random.split(k_inner_base, it_matches)

    # -- outer draws: ALL it_matches draws of num_samples candidates in ONE
    # batched Gumbel top-k over a (it_matches, B, P) tensor — inside the scan
    # this was it_matches sequential top_k(P -> num_samples) kernels, the
    # solver's dominant cost (BENCHLOG.md). Falls back to per-draw sampling
    # in the exact no-prefilter regime where the batched noise tensor would
    # be (it, B, ~3.7M) fp32 (see ops/sampling.gumbel_topk_sample_draws).
    outer_local = gumbel_topk_sample_draws(
        k_outer, logw, num_samples, it_matches, approx=approx_sampling
    )  # (it, B, S) — indices into the prefiltered table (or global w/o prefilter)
    if remap is not None:
        outer_idx = jnp.take_along_axis(
            jnp.broadcast_to(remap[None], (it_matches,) + remap.shape), outer_local, axis=2
        )
        # sampled-match weights come from the w_table (the exact score values
        # of those entries) — a P-entry gather source instead of the ~3.7M
        # -entry dense matrix.
        w_idx = outer_local
    else:
        outer_idx = outer_local
        w_idx = outer_idx

    def outer_step(carry, xs):
        k_inner, idx, idx_w = xs  # (B, S): global match indices / w-table indices
        idx0 = idx // N1
        idx1 = idx % N1

        X = jnp.take_along_axis(X_all, idx0[..., None], axis=1)  # (B, S, 3)
        Y = jnp.take_along_axis(Y_all, idx1[..., None], axis=1)
        w = jnp.take_along_axis(w_table, idx_w, axis=1)  # (B, S)

        # -- inner draws: it_ransac minimal sets of num_corr correspondences
        logw_in = jnp.broadcast_to(_log_weights(w)[:, None, :], (B, it_ransac, num_samples))
        ridx = gumbel_topk_sample(k_inner, logw_in, num_corr, approx=False)  # (B, R, C)

        Xk = jnp.take_along_axis(X[:, None], ridx[..., None], axis=2)  # (B, R, C, 3)
        Yk = jnp.take_along_axis(Y[:, None], ridx[..., None], axis=2)

        sol = weighted_procrustes(Xk, Yk, use_weights=False)  # R: (B, R, 3, 3)

        # -- score every hypothesis against all S samples of this draw
        # (fused Pallas kernel: the (B, R, S) distance tensor never leaves
        # VMEM; ops/hypothesis_scoring.py)
        score = hypothesis_scores(
            X, Y, sol.R, sol.t, th_soft_inlier, use_pallas_scoring, pallas_interpret
        )  # (B, R)
        hyp_ok = (
            sol.valid
            & jnp.all(jnp.isfinite(sol.R.reshape(B, it_ransac, 9)), axis=-1)
            & jnp.all(jnp.isfinite(sol.t.reshape(B, it_ransac, 3)), axis=-1)
        )
        score = jnp.where(hyp_ok, score, _NEG_INF)

        best = jnp.argmax(score, axis=-1)  # (B,)
        take = lambda a: jnp.take_along_axis(a, best.reshape((B,) + (1,) * (a.ndim - 1)), axis=1)[:, 0]
        out = {
            "R": take(sol.R),
            "t": take(sol.t),
            "score": jnp.take_along_axis(score, best[:, None], axis=1)[:, 0],
        }
        return carry, out

    _, per_step = jax.lax.scan(
        outer_step, None, (inner_keys, outer_idx, w_idx)
    )  # leaves: (it_matches, B, ...) — only the winning pose + score per step;
    # the big sampled tables are re-gathered below for the best draw only.

    # -- global best across the it_matches outer draws
    step_scores = per_step["score"]  # (it, B)
    best_it = jnp.argmax(step_scores, axis=0)  # (B,)
    b_idx = jnp.arange(B)

    R = per_step["R"][best_it, b_idx]  # (B, 3, 3)
    t = per_step["t"][best_it, b_idx]  # (B, 1, 3)

    # -- re-gather the best draw's correspondence set (1/it_matches of the
    # per-draw gather work the scan used to stack for every draw)
    idx_best = outer_idx[best_it, b_idx]  # (B, S) global match indices
    idx0_b = idx_best // N1
    idx1_b = idx_best % N1
    X_best = jnp.take_along_axis(X_all, idx0_b[..., None], axis=1)  # (B, S, 3)
    Y_best = jnp.take_along_axis(Y_all, idx1_b[..., None], axis=1)
    cor0_b = jnp.take_along_axis(kps0, idx0_b[..., None], axis=1)  # (B, S, 2)
    cor1_b = jnp.take_along_axis(kps1, idx1_b[..., None], axis=1)
    d0_b = jnp.take_along_axis(depth0, idx0_b[..., None], axis=1)  # (B, S, 1)
    d1_b = jnp.take_along_axis(depth1, idx1_b[..., None], axis=1)
    w_b = jnp.take_along_axis(w_table, w_idx[best_it, b_idx], axis=1)  # (B, S)

    # -- masked refinement loop (reference :284-300), fixed trips
    def ref_step(_, state):
        R, t, inliers_pre, inliers_ref = state
        inliers = inlier_counting_3d(X_best, Y_best, R, t, th=th_inlier)  # (B, S)
        n_in = jnp.sum(inliers, axis=-1)
        do_ref = (n_in >= num_corr) & (n_in > inliers_pre)
        inliers_pre = jnp.where(do_ref, n_in, inliers_pre)
        inliers_ref = jnp.where(do_ref[:, None], inliers, inliers_ref)
        sol = weighted_procrustes(X_best, Y_best, w=inliers_ref, use_weights=True, use_mask=True)
        sel = do_ref[:, None, None]
        R = jnp.where(sel, sol.R, R)
        t = jnp.where(sel, sol.t, t)
        return R, t, inliers_pre, inliers_ref

    inliers_pre0 = jnp.full((B,), float(num_corr), jnp.float32)
    inliers_ref0 = jnp.zeros((B, num_samples), jnp.float32)
    R, t, _, _ = jax.lax.fori_loop(
        0, num_refinements, ref_step, (R, t, inliers_pre0, inliers_ref0)
    )

    # -- final confidence: soft inliers at th_inlier (reference :303)
    confidence = soft_inlier_counting_3d(X_best, Y_best, R, t, th=th_inlier)[..., 0]
    inlier_mask = inlier_counting_3d(X_best, Y_best, R, t, th=th_inlier)

    valid = (
        row_ok
        & jnp.all(jnp.isfinite(R.reshape(B, 9)), axis=-1)
        & jnp.all(jnp.isfinite(t.reshape(B, 3)), axis=-1)
        & (jnp.max(step_scores, axis=0) > _NEG_INF / 2)
    )
    zero = jnp.zeros_like
    R = jnp.where(valid[:, None, None], R, zero(R))
    t = jnp.where(valid[:, None, None], t, zero(t))
    confidence = jnp.where(valid, confidence, 0.0)

    return PoseEstimate(
        R=R,
        t=t,
        confidence=confidence,
        valid=valid,
        cor0=cor0_b,
        cor1=cor1_b,
        d0=d0_b,
        d1=d1_b,
        weights=w_b,
        inlier_mask=inlier_mask,
    )


def estimate_pose_topk_from_cfg(key, tcorr, K0, K1, cfg):
    """``estimate_pose_from_cfg`` for the fused top-K matcher route: ``tcorr``
    is a TopKCorrespondences (nn/extractor.py) carrying the prefiltered
    (score, index) table instead of dense match matrices."""
    pc = cfg.PROCRUSTES
    return estimate_pose_topk(
        key,
        tcorr.top_scores,
        tcorr.top_idx,
        tcorr.row_ok,
        tcorr.kps0,
        tcorr.depth0,
        tcorr.kps1,
        tcorr.depth1,
        K0,
        K1,
        n1=tcorr.kps1.shape[1],
        it_matches=pc.IT_MATCHES,
        it_ransac=pc.IT_RANSAC,
        num_samples=pc.NUM_SAMPLED_MATCHES,
        num_corr=pc.NUM_CORR_3D_3D,
        num_refinements=pc.NUM_REFINEMENTS,
        th_inlier=pc.TH_INLIER,
        th_soft_inlier=pc.TH_SOFT_INLIER,
        approx_sampling=cfg.TPU.SAMPLING == "approx",
        use_pallas_scoring=bool(cfg.TPU.get("USE_PALLAS_SCORING", True)),
        pallas_interpret=bool(cfg.TPU.get("PALLAS_INTERPRET", False)),
    )


def estimate_pose_from_cfg(key, corr, K0, K1, cfg, final_scores=None):
    """Convenience wrapper reading PROCRUSTES.* config (reference solver
    __init__, probabilisticProcrustes.py:11-20)."""
    pc = cfg.PROCRUSTES
    fs = corr.final_scores if final_scores is None else final_scores
    return estimate_pose(
        key,
        fs,
        corr.kps0,
        corr.depth0,
        corr.kps1,
        corr.depth1,
        K0,
        K1,
        it_matches=pc.IT_MATCHES,
        it_ransac=pc.IT_RANSAC,
        num_samples=pc.NUM_SAMPLED_MATCHES,
        num_corr=pc.NUM_CORR_3D_3D,
        num_refinements=pc.NUM_REFINEMENTS,
        th_inlier=pc.TH_INLIER,
        th_soft_inlier=pc.TH_SOFT_INLIER,
        approx_sampling=cfg.TPU.SAMPLING == "approx",
        prefilter=int(cfg.TPU.get("SAMPLING_PREFILTER", 0) or 0),
        use_pallas_scoring=bool(cfg.TPU.get("USE_PALLAS_SCORING", True)),
        pallas_interpret=bool(cfg.TPU.get("PALLAS_INTERPRET", False)),
    )


def extract_inliers(est: PoseEstimate, batch_index: int = 0):
    """Host-side inlier list for one pair, sorted by score descending:
    rows [x0, y0, x1, y1, score, d0, d1] (reference :306-327 layout
    cat([cor0, cor1, score, d0, d1]))."""
    import numpy as np

    m = np.asarray(est.inlier_mask[batch_index]) == 1.0
    cor0 = np.asarray(est.cor0[batch_index])[m]
    cor1 = np.asarray(est.cor1[batch_index])[m]
    d0 = np.asarray(est.d0[batch_index])[m]
    d1 = np.asarray(est.d1[batch_index])[m]
    w = np.asarray(est.weights[batch_index])[m]
    order = np.argsort(-w)
    return np.concatenate(
        [cor0[order], cor1[order], w[order, None], d0[order], d1[order]], axis=1
    )
