"""Jitted training/validation steps + optimizer (TPU-native training loop).

Replaces the reference's Lightning manual-optimization machinery
(``model.py:51-147``): the two-phase backward collapses into one
``jax.value_and_grad`` of the surrogate total (see training/loss.py), the
NaN/Inf gates become ``optax.apply_if_finite`` (skip step on non-finite
grads, reference model.py:104-143), clip-norm 5 and Adam(lr, eps=1e-6)
match ``model.py:137,282-289``.

Data parallelism: one jitted step over the GLOBAL batch with inputs sharded
on the 'data' mesh axis and parameters replicated — XLA inserts the gradient
all-reduce (the DDP/NCCL equivalent). Note one intended deviation: the
curriculum top-K mask is computed over the global batch rather than
per-replica (reference applies it per-rank; global selection is the same
distribution with lower variance).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..nn.extractor import compute_correspondences, compute_correspondences_topk_train
from ..solver.procrustes_ransac import estimate_pose
from .loss import LossConfig, metric_pose_loss, metric_pose_loss_topk

Params = Dict[str, Any]


def _use_train_fused_topk(cfg, lc: LossConfig) -> bool:
    """Fused matcher->top-K training route gate (cfg.TPU.TRAIN_FUSED_TOPK):
    needs the two-stage sampling prefilter (the table size) and the
    DualSoftmax matcher. Off by default — the dense route is the
    gradient-parity reference (tests/test_parity_loss.py); the fused route
    is gradient-consistent with it (tests/test_fused_matcher.py) and skips
    materializing the dense match matrix in either direction."""
    return (
        bool(cfg.TPU.get("TRAIN_FUSED_TOPK", False))
        and lc.prefilter > 0
        and cfg.FEATURE_MATCHER.TYPE == "DualSoftmax"
    )


def _topk_loss_from_corr(corr, batch, key, lc, cfg, topk_pct):
    """metric_pose_loss_topk on a TrainTopKCorrespondences."""
    Rgt = batch["T_0to1"][:, :3, :3]
    tgt = batch["T_0to1"][:, :3, 3][:, None, :]
    return metric_pose_loss_topk(
        (corr.top_scores, corr.top_idx, corr.row_ok, corr.lse_row, corr.lse_col),
        corr.dsc0, corr.dsc1, corr.scr0, corr.scr1,
        corr.kps0, corr.depth0, corr.kps1, corr.depth1,
        batch["K_color0"], batch["K_color1"],
        batch["Kori_color0"], batch["Kori_color1"],
        Rgt, tgt, key, lc, topk_pct,
        temperature=float(cfg.FEATURE_MATCHER.DUAL_SOFTMAX.TEMPERATURE),
    )


class TrainState(NamedTuple):
    params: Params  # trainable: heads + matcher (incl. BN stats)
    opt_state: Any
    step: jnp.ndarray  # int32


def make_lr_fn(cfg):
    """step -> learning rate; the schedule make_optimizer applies (StepLR
    equivalent, reference model.py:282-289). Exposed so the trainer can log
    the LR scalar (reference LearningRateMonitor, train.py:57)."""
    t = cfg.TRAINING
    if t.LR_STEP_INTERVAL:
        return optax.exponential_decay(
            init_value=t.LR,
            transition_steps=int(t.LR_STEP_INTERVAL),
            decay_rate=float(t.LR_STEP_GAMMA),
            staircase=True,
        )
    return lambda step: t.LR


def make_optimizer(cfg) -> optax.GradientTransformation:
    t = cfg.TRAINING
    lr = make_lr_fn(cfg)
    chain = []
    if t.GRAD_CLIP:
        chain.append(optax.clip_by_global_norm(float(t.GRAD_CLIP)))
    chain.append(optax.adam(lr, eps=1e-6))
    # skip the update entirely when any gradient is non-finite
    return optax.apply_if_finite(optax.chain(*chain), max_consecutive_errors=10000)


def init_train_state(cfg, params: Params) -> Tuple[TrainState, Params]:
    """Split the full model pytree into (TrainState over trainables, frozen
    backbone)."""
    backbone = params["dinov2"]
    trainable = {k: v for k, v in params.items() if k != "dinov2"}
    opt = make_optimizer(cfg)
    return TrainState(trainable, opt.init(trainable), jnp.asarray(0, jnp.int32)), backbone


def _copy_bn_stats(dst: Params, src: Params) -> Params:
    """Overwrite BN running stats in dst with those from src (forward-updated)."""

    def rec(d, s):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                if "mean" in v and "var" in v and "scale" in v:
                    out[k] = dict(v, mean=s[k]["mean"], var=s[k]["var"])
                else:
                    out[k] = rec(v, s[k])
            else:
                out[k] = v
        return out

    return rec(dst, src)


def make_train_step(cfg, mesh=None):
    """Build the jitted train step. Closes over static config (and, for a
    (data, model) mesh, the tensor-parallel backbone sharding — see
    parallel.vit_tp_shardings)."""
    lc = LossConfig.from_cfg(cfg)
    optimizer = make_optimizer(cfg)
    fused_topk = _use_train_fused_topk(cfg, lc)

    def loss_fn(trainable, backbone, batch, key, topk_pct):
        params = dict(trainable, dinov2=backbone)
        if fused_topk:
            corr, new_params = compute_correspondences_topk_train(
                params, batch["image0"], batch["image1"], cfg, mesh=mesh
            )
            total, aux = _topk_loss_from_corr(corr, batch, key, lc, cfg, topk_pct)
            return total, (aux, {k: v for k, v in new_params.items() if k != "dinov2"})
        corr, new_params = compute_correspondences(
            params, batch["image0"], batch["image1"], cfg, train=True, mesh=mesh
        )
        final_scores = corr.scores * corr.kp_scores
        Rgt = batch["T_0to1"][:, :3, :3]
        tgt = batch["T_0to1"][:, :3, 3][:, None, :]
        total, aux = metric_pose_loss(
            final_scores,
            corr.kps0,
            corr.depth0,
            corr.kps1,
            corr.depth1,
            batch["K_color0"],
            batch["K_color1"],
            batch["Kori_color0"],
            batch["Kori_color1"],
            Rgt,
            tgt,
            key,
            lc,
            topk_pct,
        )
        new_trainable = {k: v for k, v in new_params.items() if k != "dinov2"}
        return total, (aux, new_trainable)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, backbone, batch, key, topk_pct):
        (_, (aux, fwd_params)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, backbone, batch, key, topk_pct
        )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # BN running stats advance via the forward pass, not the optimizer.
        new_params = _copy_bn_stats(new_params, fwd_params)

        gnorm = optax.global_norm(grads)
        metrics = {
            "loss": aux["avg_loss"],
            "loss_rot": aux["avg_loss_rot"],
            "loss_trans": aux["avg_loss_trans"],
            "grad_norm": gnorm,
            "grads_finite": jnp.isfinite(gnorm),
            "num_valid": aux["num_valid"],
        }
        return TrainState(new_params, new_opt_state, state.step + 1), metrics

    return train_step


def make_staged_train_step(cfg, mesh=None):
    """Two-program train step, split at the frozen-backbone boundary.

    The backbone carries no gradient (stop_gradient in backbone_features), so
    stage 1 — the DINOv2 forward on the stacked 2B images — is its own jitted
    program (the SAME HLO as the staged inference backbone, so the persistent
    compile cache shares it), and stage 2 jits grad(heads+matcher+loss) on
    the precomputed feature map + the Adam update. Mathematically identical
    to make_train_step (tests/test_training.py locks it); measured faster:
    the monolithic program scheduled ~140 ms worse than its parts sum
    (BENCHLOG round 3). External signature matches make_train_step's step fn.
    """
    from ..nn.extractor import backbone_features

    lc = LossConfig.from_cfg(cfg)
    optimizer = make_optimizer(cfg)

    @jax.jit
    def backbone_fwd(backbone, image0, image1):
        stacked = jnp.concatenate([image0, image1], axis=0)
        return backbone_features({"dinov2": backbone}, stacked, cfg, mesh=mesh)

    fused_topk = _use_train_fused_topk(cfg, lc)

    def loss_fn(trainable, fmap, batch, key, topk_pct):
        # images are not used when fmap is given — so the same grad program
        # serves both the staged step (batch still carries images; XLA drops
        # the dead inputs) and the feature-cache step (batch has no images)
        if fused_topk:
            corr, new_trainable = compute_correspondences_topk_train(
                trainable, None, None, cfg, mesh=mesh, fmap=fmap
            )
            total, aux = _topk_loss_from_corr(corr, batch, key, lc, cfg, topk_pct)
            return total, (aux, new_trainable)
        corr, new_trainable = compute_correspondences(
            trainable, None, None, cfg, train=True, mesh=mesh, fmap=fmap
        )
        final_scores = corr.scores * corr.kp_scores
        Rgt = batch["T_0to1"][:, :3, :3]
        tgt = batch["T_0to1"][:, :3, 3][:, None, :]
        total, aux = metric_pose_loss(
            final_scores, corr.kps0, corr.depth0, corr.kps1, corr.depth1,
            batch["K_color0"], batch["K_color1"],
            batch["Kori_color0"], batch["Kori_color1"],
            Rgt, tgt, key, lc, topk_pct,
        )
        return total, (aux, new_trainable)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def grad_step(state: TrainState, fmap, batch, key, topk_pct):
        (_, (aux, fwd_params)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, fmap, batch, key, topk_pct
        )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_params = _copy_bn_stats(new_params, fwd_params)
        gnorm = optax.global_norm(grads)
        metrics = {
            "loss": aux["avg_loss"],
            "loss_rot": aux["avg_loss_rot"],
            "loss_trans": aux["avg_loss_trans"],
            "grad_norm": gnorm,
            "grads_finite": jnp.isfinite(gnorm),
            "num_valid": aux["num_valid"],
        }
        return TrainState(new_params, new_opt_state, state.step + 1), metrics

    def train_step(state: TrainState, backbone, batch, key, topk_pct):
        fmap = backbone_fwd(backbone, batch["image0"], batch["image1"])
        return grad_step(state, fmap, batch, key, topk_pct)

    # exposed pieces: the feature-cache training path
    # (training/feature_cache.py) calls grad_step directly with disk-cached
    # features and an image-free batch; cache building reuses backbone_fwd
    train_step.backbone_fwd = backbone_fwd
    train_step.grad_step = grad_step
    return train_step


def _val_metrics_from_corr(corr, batch, key, cfg, lc, pc):
    """Shared validation body: loss metrics + full inference solver +
    pose/VCRE errors on a Correspondences (reference validation_step,
    model.py:66-89). Used by both the monolithic and the staged val step."""
    from ..metrics.pose_metrics import pose_error, vcre

    final_scores = corr.scores * corr.kp_scores
    Rgt = batch["T_0to1"][:, :3, :3]
    tgt = batch["T_0to1"][:, :3, 3][:, None, :]
    _, aux = metric_pose_loss(
        final_scores, corr.kps0, corr.depth0, corr.kps1, corr.depth1,
        batch["K_color0"], batch["K_color1"],
        batch["Kori_color0"], batch["Kori_color1"],
        Rgt, tgt, key, lc, jnp.float32(100.0),
    )
    est = estimate_pose(
        key, final_scores, corr.kps0, corr.depth0, corr.kps1, corr.depth1,
        batch["K_color0"], batch["K_color1"],
        it_matches=pc.IT_MATCHES, it_ransac=pc.IT_RANSAC,
        num_samples=pc.NUM_SAMPLED_MATCHES, num_corr=pc.NUM_CORR_3D_3D,
        num_refinements=pc.NUM_REFINEMENTS, th_inlier=pc.TH_INLIER,
        th_soft_inlier=pc.TH_SOFT_INLIER,
    )
    perr = pose_error(est.R, est.t, batch["T_0to1"])
    repr_err = vcre(
        est.R, est.t, batch["T_0to1"], batch["Kori_color0"],
        H=cfg.DATASET.HEIGHT, W=cfg.DATASET.WIDTH,
    )
    return {
        "loss": aux["avg_loss"],
        "avg_loss_rot": aux["avg_loss_rot"],
        "avg_loss_trans": aux["avg_loss_trans"],
        "t_err_ang": perr["t_err_ang"],
        "t_err_euc": perr["t_err_euc"],
        "R_err": perr["R_err"],
        "vcre": repr_err,
        "inliers": est.confidence,
    }


def make_val_step(cfg, mesh=None):
    """Validation: eval-mode forward + loss metrics + full inference solver +
    pose/VCRE errors (reference validation_step, model.py:66-89)."""
    lc = LossConfig.from_cfg(cfg)
    pc = cfg.PROCRUSTES

    @jax.jit
    def val_step(trainable, backbone, batch, key):
        params = dict(trainable, dinov2=backbone)
        corr, _ = compute_correspondences(
            params, batch["image0"], batch["image1"], cfg, train=False, mesh=mesh
        )
        return _val_metrics_from_corr(corr, batch, key, cfg, lc, pc)

    return val_step


def make_staged_val_step(cfg, mesh=None):
    """Validation split at the frozen-backbone boundary (val analog of
    make_staged_train_step): ``backbone_fwd`` runs per image batch and
    ``val_tail`` consumes a precomputed stacked (2B, Hp, Wp, C) feature map
    (image0-rows then image1-rows). The backbone is frozen, so its per-frame
    outputs are constant across the whole run — val pairs are keyframe-shared
    (reference datasets/mapfree.py:55-58), so the trainer caches each scene
    keyframe's feature map (or reads the training feature cache) and only new
    frames pay the ViT forward (round-4 cached validation epoch; the
    reference re-extracts both sides per pair, model.py:66-89). Identical
    math to make_val_step on the same inputs
    (tests/test_training.py::test_val_cached_matches_plain)."""
    from ..nn.extractor import backbone_features

    lc = LossConfig.from_cfg(cfg)
    pc = cfg.PROCRUSTES

    @jax.jit
    def backbone_fwd(backbone, images):
        return backbone_features({"dinov2": backbone}, images, cfg, mesh=mesh)

    @jax.jit
    def val_tail(trainable, fmap, batch, key):
        corr, _ = compute_correspondences(
            trainable, None, None, cfg, train=False, mesh=mesh, fmap=fmap
        )
        return _val_metrics_from_corr(corr, batch, key, cfg, lc, pc)

    val_tail.backbone_fwd = backbone_fwd
    return val_tail
