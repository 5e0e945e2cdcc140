"""Metric pose loss: differentiable Procrustes RANSAC + REINFORCE surrogate.

Counterpart of reference ``modules/loss/loss_class.py`` (MetricPoseLoss /
RANSAC_vectorized / single_iteration_RANSAC) and the two-phase manual
backward in ``model.py:91-147`` — collapsed into ONE differentiable scalar:

    total = avg_loss + sum_{b,i,s} stop_grad(mask_b (L_{b,i} - baseline_b) / it)
                               * log(final_scores[b, idx_{b,i,s}] + 1e-16)

``jax.grad`` of this total reproduces the reference's gradients exactly:
  * the ``avg_loss`` term carries the direct 3D-coordinate path (keypoint
    offsets + depths through the grad-carrying weighted Procrustes re-solve
    and the soft-inlier scores), i.e. the reference's ``avg_loss.backward()``;
  * the surrogate term's gradient w.r.t. final_scores equals the hand-built
    ``gradients`` matrix (loss_class.py:251-261, 293-302): per sampled index,
    coefficient (L_i - baseline)/it_matches, curriculum-masked, times
    d log(fs + 1e-16)/d fs — the cotangent the reference injects via its
    second ``torch.autograd.backward`` call (model.py:124-134).

Monte-Carlo sampling (torch.multinomial) becomes Gumbel top-k; the
refinement loop's data-dependent early exit becomes a fixed-trip masked
loop; NaN/try-except guards become validity masks (the NaN *step skip* of
``backward_step`` lives in the optimizer's apply_if_finite gate).

Gradient equivalence is validated against the torch reference with injected
identical samples (tests/test_parity_loss.py).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry import inlier_counting_3d, soft_inlier_counting_3d, weighted_procrustes
from ..geometry.projection import backproject_3d
from ..ops.sampling import gumbel_topk_sample, gumbel_topk_sample_draws
from .loss_utils import compute_pose_loss, compute_vcre_loss

_NEG_INF = -1e30


class LossConfig(NamedTuple):
    """Static loss hyperparameters (reference LOSS_CLASS.* schema)."""

    loss_function: str = "VCRE"  # 'VCRE' | 'POSE_ERR'
    soft_clipping: bool = True
    max_loss_null: float = 0.8
    score_temperature: float = 20.0
    it_matches: int = 20
    it_ransac: int = 20
    inlier_3d_th: float = 0.3
    inlier_ref_th: float = 0.15
    num_ref_steps: int = 4
    num_corr: int = 8
    num_samples_matches: int = 512
    add_null_hypothesis: bool = True
    th_outliers: float = 0.35
    train_with_topk: bool = True
    # two-stage sampling prefilter (see solver/procrustes_ransac.py); 0 = the
    # exact reference sampling distribution
    prefilter: int = 0

    @classmethod
    def from_cfg(cls, cfg) -> "LossConfig":
        lc = cfg.LOSS_CLASS
        if lc.LOSS_FUNCTION == "POSE_ERR":
            max_null = lc.POSE_ERR.MAX_LOSS_SOFTVALUE if lc.SOFT_CLIPPING else lc.POSE_ERR.MAX_LOSS_VALUE
        else:
            max_null = lc.VCRE.MAX_LOSS_SOFTVALUE if lc.SOFT_CLIPPING else lc.VCRE.MAX_LOSS_VALUE
        gh = lc.GENERATE_HYPOTHESES
        return cls(
            loss_function=lc.LOSS_FUNCTION,
            soft_clipping=lc.SOFT_CLIPPING,
            max_loss_null=float(max_null),
            score_temperature=float(gh.SCORE_TEMPERATURE),
            it_matches=int(gh.IT_MATCHES),
            it_ransac=int(gh.IT_RANSAC),
            inlier_3d_th=float(gh.INLIER_3D_TH),
            inlier_ref_th=float(gh.INLIER_REF_TH),
            num_ref_steps=int(gh.NUM_REF_STEPS),
            num_corr=int(gh.NUM_CORR_3d3d),
            num_samples_matches=int(lc.SAMPLER.NUM_SAMPLES_MATCHES),
            add_null_hypothesis=bool(lc.NULL_HYPOTHESIS.ADD_NULL_HYPOTHESIS),
            th_outliers=float(lc.NULL_HYPOTHESIS.TH_OUTLIERS),
            train_with_topk=bool(
                lc.CURRICULUM_LEARNING.TRAIN_WITH_TOPK or lc.CURRICULUM_LEARNING.TRAIN_CURRICULUM
            ),
            prefilter=int(cfg.get("TPU", {}).get("SAMPLING_PREFILTER", 0) or 0),
        )


def _take(bitS: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Gather values (B, N, D) at indices (B, it, S) -> (B, it, S, D)."""
    B, it, S = bitS.shape
    flat = bitS.reshape(B, it * S)
    out = jnp.take_along_axis(values, flat[..., None], axis=1)
    return out.reshape(B, it, S, values.shape[-1])


def metric_pose_loss(
    final_scores: jnp.ndarray,  # (B, N0, N1) — grad-carrying sampling scores
    kps0: jnp.ndarray,  # (B, N0, 2) — grad-carrying
    depth0: jnp.ndarray,  # (B, N0, 1)
    kps1: jnp.ndarray,
    depth1: jnp.ndarray,
    K0: jnp.ndarray,
    K1: jnp.ndarray,
    K0ori: jnp.ndarray,
    K1ori: jnp.ndarray,
    Rgt: jnp.ndarray,  # (B, 3, 3)
    tgt: jnp.ndarray,  # (B, 1, 3)
    key: jax.Array,
    lc: LossConfig,
    topk_pct: jnp.ndarray,  # traced scalar, curriculum percentage
    sample_override: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    _profile_stage: Optional[str] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (total_loss, aux). jax.grad(total) == reference gradients.

    ``_profile_stage`` is a profiling hook (tools/bench_loss_stages.py): stop
    after a named stage ('sample' | 'inner_sample' | 'refine' | 'score' |
    'pose_loss') and return a reduction of that stage's outputs, so cumulative
    prefix timings decompose the monolithic forward exactly.
    """
    B, N0, N1 = final_scores.shape
    it, R_it, S, C = lc.it_matches, lc.it_ransac, lc.num_samples_matches, lc.num_corr

    fs_flat = final_scores.reshape(B, N0 * N1)
    matches = jax.lax.stop_gradient(fs_flat)

    # invalid-matrix guard (reference loss_class.py:127-131): per-element
    # instead of per-batch (strict improvement; documented deviation).
    row_ok = (
        jnp.all(jnp.isfinite(matches), axis=-1)
        & jnp.all(matches >= 0, axis=-1)
        & (jnp.sum(matches, axis=-1) > 0)
    )

    # -- outer sampling: (B, it, S) indices ∝ matches, without replacement
    key_outer, key_inner = jax.random.split(key)
    if sample_override is not None:
        idx, ridx = sample_override
    else:
        if lc.prefilter and lc.prefilter < N0 * N1:
            top_scores, top_idx = jax.lax.approx_max_k(matches, lc.prefilter, recall_target=0.95)
            logw = jnp.where(top_scores > 0, jnp.log(jnp.maximum(top_scores, 1e-30)), _NEG_INF)
            remap = top_idx.astype(jnp.int32)
        else:
            logw = jnp.where(matches > 0, jnp.log(jnp.maximum(matches, 1e-30)), _NEG_INF)
            remap = None

        # ALL it outer draws in ONE batched Gumbel top-k when the noise
        # tensor is small enough (the prefilter regime); per-draw scan in the
        # exact no-prefilter regime to bound peak memory (see
        # ops/sampling.gumbel_topk_sample_draws).
        idx_scan = gumbel_topk_sample_draws(key_outer, logw, S, it)  # (it, B, S)
        idx = jnp.moveaxis(idx_scan, 0, 1)  # (B, it, S)
        if remap is not None:
            idx = jnp.take_along_axis(remap, idx.reshape(B, it * S), axis=1).reshape(B, it, S)
        ridx = None

    idx0 = idx // N1
    idx1 = idx % N1

    # 3D point tables computed ONCE on the N keypoints (grad-carrying), then
    # gathered per draw: backprojection is per-point elementwise, so
    # gather(backproject) == backproject(gather) — on ~2K rows instead of
    # it*S ~ 10K, and one 3-wide gather per side instead of two (kps + depth).
    # Same restructure as the inference solver (procrustes_ransac.py); the
    # gather stage was the solver's largest compute block
    # (tools/bench_solver_micro.py).
    X_all, Y_all = _point_tables(kps0, depth0, K0, kps1, depth1, K1)
    X = _take(idx0, X_all)  # (B, it, S, 3)
    Y = _take(idx1, Y_all)
    weights = _take(idx, matches[..., None])[..., 0]  # (B, it, S), detached
    if _profile_stage == "sample":
        return jnp.sum(X) + jnp.sum(Y) + jnp.sum(weights), {}

    # grad-carrying log of the sampled final scores (REINFORCE surrogate
    # term; the fused-topk route computes the same quantity without the
    # dense matrix — see metric_pose_loss_topk)
    log_fs = jnp.log(fs_flat + 1e-16)
    log_sampled = jnp.take_along_axis(log_fs, idx.reshape(B, it * S), axis=1).reshape(B, it, S)

    total, aux = _hypotheses_loss_core(
        X, Y, weights, log_sampled, ridx, row_ok,
        Rgt, tgt, K0ori, K1ori, key_inner, lc, topk_pct, _profile_stage,
    )
    if aux:
        aux["sampled_idx"] = idx
    return total, aux


def _point_tables(kps0, depth0, K0, kps1, depth1, K1):
    """Finite-sanitized backprojected 3D point tables (see call-site note).

    Head outputs are sanitized to finite values first: the tables touch ALL
    N rows, so a non-finite depth/kps at a never-sampled row would leak NaN
    into the gather VJP (0 cotangent x inf = NaN) where a
    gather-then-backproject path never evaluated that row. For finite
    outputs (the invariant row_ok + apply_if_finite enforce elsewhere)
    nan_to_num is the identity with identity gradient."""
    kps0 = jnp.nan_to_num(kps0)
    kps1 = jnp.nan_to_num(kps1)
    depth0 = jnp.nan_to_num(depth0)
    depth1 = jnp.nan_to_num(depth1)
    X_all = backproject_3d(kps0, depth0, K0)  # (B, N0, 3)
    Y_all = backproject_3d(kps1, depth1, K1)  # (B, N1, 3)
    return X_all, Y_all


def _hypotheses_loss_core(
    X: jnp.ndarray,  # (B, it, S, 3) sampled 3D points, grad-carrying
    Y: jnp.ndarray,
    weights: jnp.ndarray,  # (B, it, S) detached sampling weights
    log_sampled: jnp.ndarray,  # (B, it, S) grad-carrying log final scores
    ridx,  # (B, it, R_it, C) inner minimal-set indices or None
    row_ok: jnp.ndarray,  # (B,) sampling-distribution validity
    Rgt, tgt, K0ori, K1ori,
    key_inner: jax.Array,
    lc: LossConfig,
    topk_pct: jnp.ndarray,
    _profile_stage: Optional[str] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Hypothesis generation -> REINFORCE total, shared by the dense and the
    fused-topk loss entries (everything downstream of sampling is identical
    between them; reference loss_class.py:163-319)."""
    B, it, S = weights.shape
    R_it, C = lc.it_ransac, lc.num_corr

    # -- inner sampling: (B, it, R_it, C) minimal sets ∝ weights
    if ridx is None:
        logw_in = jnp.where(weights > 0, jnp.log(jnp.maximum(weights, 1e-30)), _NEG_INF)
        logw_in = jnp.broadcast_to(logw_in[:, :, None, :], (B, it, R_it, S))
        ridx = gumbel_topk_sample(key_inner, logw_in, C)

    # one-hot minimal-set masks (indices within a draw are distinct)
    minimal = jnp.sum(jax.nn.one_hot(ridx, S, dtype=jnp.float32), axis=-2)  # (B,it,R_it,S)
    if _profile_stage == "inner_sample":
        return jnp.sum(minimal), {}

    # -- refinement under stop_grad (reference loss_class.py:163-196)
    Xd = jax.lax.stop_gradient(X)[:, :, None]  # (B, it, 1, S, 3)
    Yd = jax.lax.stop_gradient(Y)[:, :, None]

    inliers = minimal
    inliers_final = minimal
    inliers_pre = jnp.full((B, it, R_it), float(C), jnp.float32)
    inliers_ref = jnp.zeros((B, it, R_it, S), jnp.float32)
    do_ref = jnp.ones((B, it, R_it), bool)

    for _ in range(lc.num_ref_steps):
        sol = weighted_procrustes(Xd, Yd, w=inliers, use_weights=True, use_mask=True)
        counted = inlier_counting_3d(Xd, Yd, sol.R, sol.t, th=lc.inlier_ref_th)
        inliers_ref = jnp.where(do_ref[..., None], counted, inliers_ref)
        do_ref = jnp.sum(inliers_ref, axis=-1) > inliers_pre
        inliers_pre = jnp.where(do_ref, jnp.sum(inliers_ref, axis=-1), inliers_pre)
        inliers_final = jnp.where(do_ref[..., None], inliers, inliers_final)
        inliers = jnp.where(do_ref[..., None], inliers_ref, inliers)
    if _profile_stage == "refine":
        return jnp.sum(inliers_final) + jnp.sum(inliers), {}

    # -- grad-carrying re-solve with the final inlier sets (loss_class.py:199)
    sol = weighted_procrustes(
        X[:, :, None], Y[:, :, None], w=jax.lax.stop_gradient(inliers_final),
        use_weights=True, use_mask=True,
    )
    R, t = sol.R, sol.t  # (B, it, R_it, 3, 3) / (B, it, R_it, 1, 3)

    # -- hypothesis scores (grad-carrying, loss_class.py:226)
    score_k = soft_inlier_counting_3d(X[:, :, None], Y[:, :, None], R, t, th=lc.inlier_3d_th)[..., 0]
    if _profile_stage == "score":
        return jnp.sum(score_k), {}

    # -- per-hypothesis pose loss (loss_class.py:229)
    compute_loss = compute_pose_loss if lc.loss_function == "POSE_ERR" else compute_vcre_loss
    flatten = lambda a: a.reshape((B * it * R_it,) + a.shape[3:])
    tile = lambda a: jnp.broadcast_to(a[:, None, None], (B, it, R_it) + a.shape[1:]).reshape(
        (B * it * R_it,) + a.shape[1:]
    )
    loss_value_k, loss_rot_k, loss_trans_k = compute_loss(
        flatten(R), flatten(t), tile(Rgt), tile(tgt), tile(K0ori), tile(K1ori),
        soft_clipping=lc.soft_clipping,
    )
    loss_value_k = loss_value_k.reshape(B, it, R_it)
    loss_rot_k = loss_rot_k.reshape(B, it, R_it)
    loss_trans_k = loss_trans_k.reshape(B, it, R_it)
    if _profile_stage == "pose_loss":
        return jnp.sum(loss_value_k) + jnp.sum(loss_rot_k), {}

    # -- score-weighted aggregation (loss_class.py:238-248)
    w_soft = jax.nn.softmax(score_k / lc.score_temperature, axis=-1)
    loss_rot = jnp.sum(loss_rot_k * w_soft, axis=-1)  # (B, it)
    loss_trans = jnp.sum(loss_trans_k * w_soft, axis=-1)

    if lc.add_null_hypothesis:
        null_score = jnp.full((B, it, 1), lc.th_outliers * S, score_k.dtype)
        null_loss = jnp.full((B, it, 1), lc.max_loss_null, loss_value_k.dtype)
        score_aug = jnp.concatenate([score_k, null_score], axis=-1)
        loss_aug = jnp.concatenate([loss_value_k, null_loss], axis=-1)
    else:
        score_aug, loss_aug = score_k, loss_value_k
    loss_value = jnp.sum(loss_aug * jax.nn.softmax(score_aug / lc.score_temperature, axis=-1), axis=-1)

    # -- expectations over REINFORCE iterations (loss_class.py:293-296)
    baseline = jnp.sum(loss_value, axis=-1) / it  # (B,) grad-carrying
    losses_rot = jnp.sum(loss_rot, axis=-1) / it
    losses_trans = jnp.sum(loss_trans, axis=-1) / it

    # -- curriculum top-K image-pair mask (loss_class.py:309-319)
    baseline_d = jax.lax.stop_gradient(baseline)
    if lc.train_with_topk and B > 1:
        sb = jnp.clip((B * topk_pct // 100).astype(jnp.int32), 1, B - 1)
        thresh = jnp.sort(baseline_d)[sb]
        # topk_pct >= 100 means "no masking" (the reference never indexes past
        # the curriculum cap, but validation passes 100.0): without the guard
        # the sb clip to B-1 would silently mask the single worst pair.
        mask_topk = jnp.where(
            topk_pct >= 100.0, 1.0, (baseline_d < thresh).astype(jnp.float32)
        )
    else:
        mask_topk = jnp.ones((B,), jnp.float32)
    mask_topk = mask_topk * row_ok.astype(jnp.float32)

    denom = jnp.maximum(jnp.sum(mask_topk), 1.0)
    avg_loss = jnp.sum(mask_topk * baseline) / denom

    # -- REINFORCE surrogate (replaces loss_class.py:251-261 + model.py:124-134)
    coeff = jax.lax.stop_gradient(
        mask_topk[:, None] * (loss_value - baseline[:, None]) / it
    )
    surrogate = jnp.sum(coeff[..., None] * log_sampled)

    total = avg_loss + surrogate

    hyp_finite = jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t))
    aux = {
        "avg_loss": avg_loss,
        "avg_loss_rot": jnp.mean(losses_rot),
        "avg_loss_trans": jnp.mean(losses_trans),
        "baseline": baseline_d,
        "mask_topk": mask_topk,
        "num_valid": jnp.sum(row_ok.astype(jnp.int32)),
        "hyp_finite": hyp_finite,
        "loss_value": jax.lax.stop_gradient(loss_value),
    }
    return total, aux


def metric_pose_loss_topk(
    topk: Tuple[jnp.ndarray, ...],  # (top_scores, top_idx, row_ok, lse_row, lse_col)
    dsc0: jnp.ndarray,  # (B, N0, C) grad-carrying L2-normalized descriptors
    dsc1: jnp.ndarray,
    scr0: jnp.ndarray,  # (B, N0, 1) grad-carrying detection scores
    scr1: jnp.ndarray,
    kps0: jnp.ndarray,  # (B, N0, 2) grad-carrying
    depth0: jnp.ndarray,  # (B, N0, 1)
    kps1: jnp.ndarray,
    depth1: jnp.ndarray,
    K0: jnp.ndarray,
    K1: jnp.ndarray,
    K0ori: jnp.ndarray,
    K1ori: jnp.ndarray,
    Rgt: jnp.ndarray,
    tgt: jnp.ndarray,
    key: jax.Array,
    lc: LossConfig,
    topk_pct: jnp.ndarray,
    temperature: float = 0.1,
    sample_override: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Fused matcher->top-K training loss: ``metric_pose_loss`` without the
    dense (B, N0, N1) final-score matrix, in forward OR backward.

    ``topk`` is the five-tuple from ops/fused_matcher.fused_topk_scores_train
    (or its dense CPU fallback): the detached top-P sampling table plus
    grad-carrying row/column logsumexps. Sampling draws from the table (the
    two-stage top-P sampling the dense route uses at
    TPU.SAMPLING_PREFILTER=P, with the kernel's exact per-row-top-L
    selection instead of approx_max_k), and the REINFORCE surrogate is
    computed in closed form:

        log final_ij = 2 s_ij - lse_row_i - lse_col_j + log scr0_i + log scr1_j

    with s recomputed only at the <= P sampled candidates (a (P, C) gather +
    rowwise dot — microscopic next to the dense matrix). Gradient
    consistency with the dense entry is locked by
    tests/test_fused_matcher.py::test_loss_topk_grad_matches_dense.

    ``sample_override`` must provide BOTH (idx, ridx) here (flat idx; the
    dense entry can derive weights for inner sampling from the matrix, this
    route cannot for indices outside its table)."""
    top_scores, top_idx, row_ok, lse_row, lse_col = topk
    B, N0, _ = dsc0.shape
    N1 = dsc1.shape[1]
    it, S = lc.it_matches, lc.num_samples_matches
    inv_temp = 1.0 / float(temperature)

    key_outer, key_inner = jax.random.split(key)
    tab = jax.lax.stop_gradient(top_scores)  # (B, P)
    if sample_override is not None:
        idx, ridx = sample_override
        if ridx is None:
            raise ValueError("metric_pose_loss_topk needs a full (idx, ridx) override")
        weights = jnp.zeros((B, it, S), jnp.float32)  # unused with ridx given
    else:
        logw = jnp.where(tab > 0, jnp.log(jnp.maximum(tab, 1e-30)), _NEG_INF)
        pos_scan = gumbel_topk_sample_draws(key_outer, logw, S, it)  # (it, B, S)
        pos = jnp.moveaxis(pos_scan, 0, 1).reshape(B, it * S)  # table positions
        idx = jnp.take_along_axis(top_idx, pos, axis=1).reshape(B, it, S)
        weights = jnp.take_along_axis(tab, pos, axis=1).reshape(B, it, S)
        ridx = None

    idx0 = idx // N1
    idx1 = idx % N1

    X_all, Y_all = _point_tables(kps0, depth0, K0, kps1, depth1, K1)
    X = _take(idx0, X_all)
    Y = _take(idx1, Y_all)

    # closed-form log final score at the sampled entries (docstring): one
    # (B, it*S, C) descriptor gather per side + a rowwise dot. HIGHEST
    # matches the kernel/dense correlation precision.
    d0g = _take(idx0, dsc0)  # (B, it, S, C)
    d1g = _take(idx1, dsc1)
    s_samp = (
        jnp.sum(d0g.astype(jnp.float32) * d1g.astype(jnp.float32), axis=-1) * inv_temp
    )
    lr = _take(idx0, lse_row[..., None])[..., 0]
    lcol = _take(idx1, lse_col[..., None])[..., 0]
    ls0 = jnp.log(jnp.maximum(_take(idx0, scr0)[..., 0], 1e-30))
    ls1 = jnp.log(jnp.maximum(_take(idx1, scr1)[..., 0], 1e-30))
    log_sampled = 2.0 * s_samp - lr - lcol + ls0 + ls1

    total, aux = _hypotheses_loss_core(
        X, Y, weights, log_sampled, ridx, row_ok,
        Rgt, tgt, K0ori, K1ori, key_inner, lc, topk_pct, None,
    )
    if aux:
        aux["sampled_idx"] = idx
    return total, aux
