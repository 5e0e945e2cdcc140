"""Inference model: MickeyRelativePose — metric relative pose between two images.

Counterpart of reference ``lib/models/MicKey/compute_pose.py``: runs the
correspondence trunk + probabilistic Procrustes solver, returning R, t, the
soft-inlier confidence and everything needed for visualization.

TPU design: a single jitted function over (params, image0, image1, K0, K1,
key); batch sharding over a 1-D data-parallel mesh happens at the pjit level
(see parallel.py) — image pairs are embarrassingly parallel across chips.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..nn.extractor import Correspondences, compute_correspondences, model_init
from ..solver.procrustes_ransac import (
    PoseEstimate,
    estimate_pose_from_cfg,
    estimate_pose_topk_from_cfg,
)

Params = Dict[str, Any]


class RelativePoseOutput(NamedTuple):
    R: jnp.ndarray  # (B, 3, 3)
    t: jnp.ndarray  # (B, 1, 3)
    inliers: jnp.ndarray  # (B,) confidence (soft inlier count)
    valid: jnp.ndarray  # (B,)
    estimate: PoseEstimate  # full solver output (inlier subsets etc.)
    corr: Correspondences  # trunk outputs (score/depth maps etc.)


class MickeyRelativePose:
    """Stateless-apply inference wrapper. Weights live in a params pytree.

    ``lite=True`` returns only (R, t, confidence, valid) — the trunk's dense
    intermediates (two ~120 MB match matrices per batch at the benchmark
    resolution) are never materialized as jit outputs, which matters for
    throughput and for the slow tunnel-transfer path. The demo/visualization
    path uses the full output.
    """

    def __init__(self, cfg, params: Optional[Params] = None, seed: int = 0):
        self.cfg = cfg
        self.params = params if params is not None else model_init(jax.random.PRNGKey(seed), cfg)
        if cfg.MICKEY.DINOV2.get("INT8", False):
            # opt-in int8 PTQ of the frozen backbone (nn/quant.py; measured
            # +26 ms/batch-16 on chip, BENCHLOG round 5). Every serving arm
            # below picks it up automatically: the block body dispatches on
            # the param tree (nn/quant.maybe_linear). Idempotent on
            # already-quantized trees.
            from ..nn.quant import vit_quantize_int8

            self.params = dict(self.params, dinov2=vit_quantize_int8(self.params["dinov2"]))
        self._apply = functools.partial(_forward, cfg=cfg)

    def __call__(self, image0, image1, K0, K1, key=None, lite: bool = False):
        """image0/1: (B, H, W, 3) float in [0,1] NHWC; K: (B, 3, 3)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        return self._apply(self.params, image0, image1, K0, K1, key, lite=lite)

    def extract_feats(self, images):
        """Per-image extract (backbone + heads): (B, H, W, 3) -> tuple of
        head-output maps (kpts, depths, scores, descs), each (B, hp, wp, .).
        Deterministic (eval mode), so outputs are cacheable per frame."""
        cfg_id = id(self.cfg)
        _CFG_REGISTRY[cfg_id] = self.cfg
        fmap = _backbone_jit(self.params, images, cfg_id)
        return _heads_jit(self.params, fmap, cfg_id)

    def call_with_ref_feats(self, ref_feats, image1, K0, K1, key=None):
        """Pose from CACHED reference-side extract outputs + query images.

        The shared-reference serving path: the Map-free benchmark pairs every
        query of a scene with the same seq0 keyframe, so ``ref_feats``
        (from ``extract_feats``, gathered per pair) is computed once per
        scene and only the B query images pay the backbone. Same math as
        ``__call__`` (lite) on the same inputs — equality locked at 1e-6 on
        CPU (tests/test_data_pipeline.py::test_predict_shared_ref_matches_
        plain); on TPU the B- vs 2B-image extract programs may tile
        differently, so low-order-bit drift can flip individual discrete
        RANSAC draws (distribution-level no-op)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        cfg_id = id(self.cfg)
        _CFG_REGISTRY[cfg_id] = self.cfg
        q_feats = self.extract_feats(image1)
        if _use_fused_topk(self.cfg):
            tcorr = _match_feats_topk_jit(self.params, ref_feats, q_feats, cfg_id)
            est = estimate_pose_topk_from_cfg(key, tcorr, K0, K1, self.cfg)
        else:
            corr = _match_feats_jit(self.params, ref_feats, q_feats, cfg_id)
            est = estimate_pose_from_cfg(key, corr, K0, K1, self.cfg)
        return RelativePoseOutput(
            R=est.R, t=est.t, inliers=est.confidence, valid=est.valid,
            estimate=None, corr=None,
        )

    def sharded_extract_feats(self, mesh, images):
        """``extract_feats`` over a data-parallel mesh (shard_mapped, so the
        Pallas kernels run per-shard rather than being replicated by GSPMD)."""
        cfg_id = id(self.cfg)
        _CFG_REGISTRY[cfg_id] = self.cfg
        return _sharded_extract(mesh, cfg_id)(self.params, images)

    def sharded_call_with_ref_feats(self, mesh, ref_feats, image1, K0, K1, key=None):
        """Shared-reference serving over a data-parallel mesh: cached keyframe
        extract outputs ride in batch-sharded, only query images run the
        backbone on each chip. Mesh analog of ``call_with_ref_feats`` —
        per-shard RANSAC keys fold exactly like ``sharded_call``."""
        if key is None:
            key = jax.random.PRNGKey(0)
        cfg_id = id(self.cfg)
        _CFG_REGISTRY[cfg_id] = self.cfg
        R, t, conf, valid = _sharded_forward_shared(mesh, cfg_id)(
            self.params, *ref_feats, image1, K0, K1, key
        )
        return RelativePoseOutput(
            R=R, t=t, inliers=conf, valid=valid, estimate=None, corr=None
        )

    def sharded_call(self, mesh, image0, image1, K0, K1, key=None):
        """Data-parallel inference over a device mesh (lite output).

        The FULL pipeline is shard_mapped over the 'data' axis: each chip
        runs its own copy of the program — including the Pallas kernels — on
        its local batch shard. A pallas_call cannot be partitioned by GSPMD,
        so jitting the normal path over batch-sharded inputs would force the
        partitioner to replicate those kernels instead of sharding them;
        shard_map is the TPU-native serving layout (pairs are embarrassingly
        parallel, reference submission.py:32-61 loops a single GPU).
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        cfg_id = id(self.cfg)
        _CFG_REGISTRY[cfg_id] = self.cfg
        R, t, conf, valid = _sharded_forward(mesh, cfg_id)(
            self.params, image0, image1, K0, K1, key
        )
        return RelativePoseOutput(
            R=R, t=t, inliers=conf, valid=valid, estimate=None, corr=None
        )


# NOTE: inference runs as a PIPELINE of separately-compiled XLA programs
# (backbone -> heads -> matcher -> solver) rather than one fused graph. The
# fused program's compile time exceeds the remote-compile service's limits
# (and its request pipe breaks on multi-minute compiles); staged programs
# each compile quickly, land in the persistent compilation cache
# independently, and cost only a few extra dispatches (all inter-stage
# tensors live in HBM either way).


@functools.partial(jax.jit, static_argnames=("cfg_id",))
def _backbone_jit(params, images, cfg_id):
    from ..nn.extractor import backbone_features

    return backbone_features(params, images, _CFG_REGISTRY[cfg_id])


@functools.partial(jax.jit, static_argnames=("cfg_id",))
def _heads_jit(params, fmap, cfg_id):
    from ..nn.extractor import heads_apply

    (kpts, depths, scores, descs), _ = heads_apply(params, fmap, _CFG_REGISTRY[cfg_id], train=False)
    return kpts, depths, scores, descs


@functools.partial(jax.jit, static_argnames=("cfg_id",))
def _match_feats_jit(params, feats0, feats1, cfg_id):
    """Matcher stage on separately-extracted per-side head outputs.

    The shared-reference serving path (see ``predict`` in cli/submission.py):
    in the Map-free benchmark every pair of a scene reuses the SAME seq0
    keyframe (reference datasets/mapfree.py:55-58), so its extract outputs
    are computed once per scene and only the query side runs the backbone —
    the reference re-extracts the keyframe for every pair
    (submission.py:32-61). Identical math to ``_match_jit`` on the stacked
    tensors.
    """
    import jax.numpy as jnp

    stacked = tuple(
        jnp.concatenate([a, b], axis=0) for a, b in zip(feats0, feats1)
    )
    return _match_jit(params, *stacked, cfg_id)


@functools.partial(jax.jit, static_argnames=("cfg_id",))
def _match_feats_topk_jit(params, feats0, feats1, cfg_id):
    """Fused top-K analog of ``_match_feats_jit`` (shared-reference serving)."""
    import jax.numpy as jnp

    stacked = tuple(
        jnp.concatenate([a, b], axis=0) for a, b in zip(feats0, feats1)
    )
    return _match_topk_jit(params, *stacked, cfg_id)


def _correspondences_from_heads(params, kpts, depths, scores, descs, cfg):
    """Matcher-stage math on stacked (2B) head outputs — shared by the jitted
    staged stage (`_match_jit`) and the shard_mapped shared-ref serving path
    (`_local_forward_shared`)."""
    import jax.numpy as jnp

    from ..nn.extractor import Correspondences, _flatten_maps, absolute_kpt_coordinates
    from ..nn.matcher import match_scores

    b = kpts.shape[0] // 2
    kpts = absolute_kpt_coordinates(kpts, cfg.MICKEY.DINOV2.DOWN_FACTOR)
    (k0, k1), (d0, d1), (s0, s1), (c0, c1) = ((t[:b], t[b:]) for t in (kpts, depths, scores, descs))
    kps0, depth0, scr0, dsc0 = _flatten_maps(k0, d0, s0, c0)
    kps1, depth1, scr1, dsc1 = _flatten_maps(k1, d1, s1, c1)
    match = match_scores(params["matcher"], dsc0, dsc1, cfg, allow_fused=True)
    kp_scores = jnp.einsum("bni,bmi->bnm", scr0, scr1, precision=jax.lax.Precision.HIGHEST)
    return Correspondences(
        kps0=kps0, depth0=depth0, scr0=scr0, dsc0=dsc0,
        kps1=kps1, depth1=depth1, scr1=scr1, dsc1=dsc1,
        scores=match, kp_scores=kp_scores, depth_map0=d0, depth_map1=d1,
    )


@functools.partial(jax.jit, static_argnames=("cfg_id",))
def _match_jit(params, kpts, depths, scores, descs, cfg_id):
    return _correspondences_from_heads(
        params, kpts, depths, scores, descs, _CFG_REGISTRY[cfg_id]
    )


@functools.partial(jax.jit, static_argnames=("cfg_id",))
def _match_topk_jit(params, kpts, depths, scores, descs, cfg_id):
    """Fused matcher->top-K stage (cfg.TPU.FUSED_TOPK): the dense match
    matrices never exist; see extractor.topk_correspondences_from_heads."""
    from ..nn.extractor import absolute_kpt_coordinates, topk_correspondences_from_heads

    cfg = _CFG_REGISTRY[cfg_id]
    kpts = absolute_kpt_coordinates(kpts, cfg.MICKEY.DINOV2.DOWN_FACTOR)
    return topk_correspondences_from_heads(params, kpts, depths, scores, descs, cfg)


def _use_fused_topk(cfg) -> bool:
    return bool(cfg.TPU.get("FUSED_TOPK", False)) and int(
        cfg.TPU.get("SAMPLING_PREFILTER", 0) or 0
    ) > 0


def _staged_correspondences(params, image0, image1, cfg_id, topk=False):
    import jax.numpy as jnp

    stacked = jnp.concatenate([image0, image1], axis=0)
    fmap = _backbone_jit(params, stacked, cfg_id)
    kpts, depths, scores, descs = _heads_jit(params, fmap, cfg_id)
    match = _match_topk_jit if topk else _match_jit
    return match(params, kpts, depths, scores, descs, cfg_id)


def _forward_jit(params, image0, image1, K0, K1, key, cfg_id, lite=False):
    cfg = _CFG_REGISTRY[cfg_id]
    if lite and _use_fused_topk(cfg):
        # lite only: the full output carries the dense corr for visualization
        tcorr = _staged_correspondences(params, image0, image1, cfg_id, topk=True)
        est = estimate_pose_topk_from_cfg(key, tcorr, K0, K1, cfg)
        return RelativePoseOutput(
            R=est.R, t=est.t, inliers=est.confidence, valid=est.valid, estimate=None, corr=None
        )
    corr = _staged_correspondences(params, image0, image1, cfg_id)
    est = estimate_pose_from_cfg(key, corr, K0, K1, cfg)  # jitted internally
    if lite:
        return RelativePoseOutput(
            R=est.R, t=est.t, inliers=est.confidence, valid=est.valid, estimate=None, corr=None
        )
    return RelativePoseOutput(
        R=est.R, t=est.t, inliers=est.confidence, valid=est.valid, estimate=est, corr=corr
    )


def _local_extract(params, images, cfg_id):
    """Per-device extract for shard_map: backbone + heads on a local shard."""
    from ..nn.extractor import backbone_features, heads_apply

    cfg = _CFG_REGISTRY[cfg_id]
    fmap = backbone_features(params, images, cfg)
    (kpts, depths, scores, descs), _ = heads_apply(params, fmap, cfg, train=False)
    return kpts, depths, scores, descs


@functools.lru_cache(maxsize=8)
def _sharded_extract(mesh, cfg_id):
    from jax.sharding import PartitionSpec as P

    from ..parallel import DATA_AXIS

    return jax.jit(
        jax.shard_map(
            functools.partial(_local_extract, cfg_id=cfg_id),
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS),) * 4,
            check_vma=False,
        )
    )


def _local_forward_shared(params, rk, rd, rs, rc, image1, K0, K1, key, cfg_id):
    """Per-device shared-ref forward for shard_map: cached reference extract
    outputs (rk/rd/rs/rc) arrive as inputs, only the query images run the
    backbone — the mesh analog of ``call_with_ref_feats``."""
    import jax.numpy as jnp

    from ..parallel import DATA_AXIS

    cfg = _CFG_REGISTRY[cfg_id]
    key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
    q = _local_extract(params, image1, cfg_id)
    stacked = tuple(jnp.concatenate([r, t], axis=0) for r, t in zip((rk, rd, rs, rc), q))
    if _use_fused_topk(cfg):
        from ..nn.extractor import absolute_kpt_coordinates, topk_correspondences_from_heads
        from ..solver.procrustes_ransac import estimate_pose_topk_from_cfg

        kpts = absolute_kpt_coordinates(stacked[0], cfg.MICKEY.DINOV2.DOWN_FACTOR)
        tcorr = topk_correspondences_from_heads(params, kpts, *stacked[1:], cfg)
        est = estimate_pose_topk_from_cfg(key, tcorr, K0, K1, cfg)
    else:
        corr = _correspondences_from_heads(params, *stacked, cfg)
        est = estimate_pose_from_cfg(key, corr, K0, K1, cfg)
    return est.R, est.t, est.confidence, est.valid


@functools.lru_cache(maxsize=8)
def _sharded_forward_shared(mesh, cfg_id):
    from jax.sharding import PartitionSpec as P

    from ..parallel import DATA_AXIS

    bspec, rspec = P(DATA_AXIS), P()
    return jax.jit(
        jax.shard_map(
            functools.partial(_local_forward_shared, cfg_id=cfg_id),
            mesh=mesh,
            in_specs=(rspec,) + (bspec,) * 7 + (rspec,),
            out_specs=(bspec, bspec, bspec, bspec),
            check_vma=False,
        )
    )


def _local_forward(params, image0, image1, K0, K1, key, cfg_id):
    """Per-device forward for shard_map: the whole pipeline on a local shard."""
    from ..nn.extractor import compute_correspondences
    from ..parallel import DATA_AXIS

    cfg = _CFG_REGISTRY[cfg_id]
    # decorrelate RANSAC noise across data shards: the key arrives replicated,
    # so without the fold every chip would draw identical Gumbel noise for its
    # local batch slice (same-local-index pairs would share randomness)
    key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
    if _use_fused_topk(cfg):
        import jax.numpy as jnp

        from ..nn.extractor import absolute_kpt_coordinates, topk_correspondences_from_heads
        from ..solver.procrustes_ransac import estimate_pose_topk_from_cfg

        stacked = jnp.concatenate([image0, image1], axis=0)
        kpts, depths, scores, descs = _local_extract(params, stacked, cfg_id)
        kpts = absolute_kpt_coordinates(kpts, cfg.MICKEY.DINOV2.DOWN_FACTOR)
        tcorr = topk_correspondences_from_heads(params, kpts, depths, scores, descs, cfg)
        est = estimate_pose_topk_from_cfg(key, tcorr, K0, K1, cfg)
    else:
        corr, _ = compute_correspondences(params, image0, image1, cfg, train=False)
        est = estimate_pose_from_cfg(key, corr, K0, K1, cfg)
    return est.R, est.t, est.confidence, est.valid


@functools.lru_cache(maxsize=8)
def _sharded_forward(mesh, cfg_id):
    from jax.sharding import PartitionSpec as P

    from ..parallel import DATA_AXIS

    bspec, rspec = P(DATA_AXIS), P()
    return jax.jit(
        jax.shard_map(
            functools.partial(_local_forward, cfg_id=cfg_id),
            mesh=mesh,
            in_specs=(rspec, bspec, bspec, bspec, bspec, rspec),
            out_specs=(bspec, bspec, bspec, bspec),
            check_vma=False,
        )
    )


# configs are unhashable dicts; register them by id for the jit static arg
_CFG_REGISTRY: Dict[int, Any] = {}


def _forward(params, image0, image1, K0, K1, key, cfg, lite=False):
    cfg_id = id(cfg)
    _CFG_REGISTRY[cfg_id] = cfg
    return _forward_jit(params, image0, image1, K0, K1, key, cfg_id, lite=lite)
