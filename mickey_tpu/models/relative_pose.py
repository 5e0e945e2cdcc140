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
from ..solver.procrustes_ransac import PoseEstimate, estimate_pose_from_cfg

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
        self._apply = functools.partial(_forward, cfg=cfg)

    def __call__(self, image0, image1, K0, K1, key=None, lite: bool = False):
        """image0/1: (B, H, W, 3) float in [0,1] NHWC; K: (B, 3, 3)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        return self._apply(self.params, image0, image1, K0, K1, key, lite=lite)


# NOTE: trunk and solver are compiled as SEPARATE XLA programs. Fusing the
# ViT-L trunk with the RANSAC solver (whose sampling stage contains
# approx_max_k over the 3.7M-entry match matrix) blows up XLA compile time
# past the remote-compile service's limits; split, each compiles quickly and
# the extra dispatch is negligible (the match matrix lives in HBM either way).


@functools.partial(jax.jit, static_argnames=("cfg_id",))
def _trunk_jit(params, image0, image1, cfg_id):
    cfg = _CFG_REGISTRY[cfg_id]
    corr, _ = compute_correspondences(params, image0, image1, cfg, train=False)
    return corr


def _forward_jit(params, image0, image1, K0, K1, key, cfg_id, lite=False):
    cfg = _CFG_REGISTRY[cfg_id]
    corr = _trunk_jit(params, image0, image1, cfg_id)
    est = estimate_pose_from_cfg(key, corr, K0, K1, cfg)  # jitted internally
    if lite:
        return RelativePoseOutput(
            R=est.R, t=est.t, inliers=est.confidence, valid=est.valid, estimate=None, corr=None
        )
    return RelativePoseOutput(
        R=est.R, t=est.t, inliers=est.confidence, valid=est.valid, estimate=est, corr=corr
    )


# configs are unhashable dicts; register them by id for the jit static arg
_CFG_REGISTRY: Dict[int, Any] = {}


def _forward(params, image0, image1, K0, K1, key, cfg, lite=False):
    cfg_id = id(cfg)
    _CFG_REGISTRY[cfg_id] = cfg
    return _forward_jit(params, image0, image1, K0, K1, key, cfg_id, lite=lite)
