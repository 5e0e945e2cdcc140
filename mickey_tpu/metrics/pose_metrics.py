"""Device-side (jnp) pose/VCRE metrics used during training & validation.

Counterparts of reference ``lib/utils/metrics.py`` (pose_error_torch,
vcre_torch, error_auc, A_metrics) — batched, jittable.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..evaluation.reprojection import get_grid_multipleheight
from ..geometry.projection import project_2d

_EYE_COORDS = get_grid_multipleheight()  # (196, 4)


def pose_error(R: jnp.ndarray, t: jnp.ndarray, Tgt: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Angular/scale/euclidean translation error + angular rotation error.

    R: (B, 3, 3); t: (B, 1, 3); Tgt: (B, 4, 4). Matches reference
    ``pose_error_torch`` (metrics.py:12-53), reduce=None.
    """
    Rgt = Tgt[:, :3, :3]
    tgt = jnp.swapaxes(Tgt[:, :3, 3:], 1, 2)  # (B, 1, 3)

    scale_t = jnp.linalg.norm(t, axis=-1)
    scale_tgt = jnp.linalg.norm(tgt, axis=-1)

    cosine = jnp.einsum("bij,bkj->bik", t, tgt)[:, :, 0] / (scale_t * scale_tgt + 1e-9)
    cosine = jnp.clip(cosine, -1.0, 1.0)
    t_ang_err = jnp.degrees(jnp.arccos(cosine))
    t_ang_err = jnp.minimum(t_ang_err, 180.0 - t_ang_err)

    t_scale_err = scale_t / scale_tgt
    t_scale_err_sym = jnp.maximum(scale_t / scale_tgt, scale_tgt / scale_t)
    t_euclidean_err = jnp.linalg.norm(t - tgt, axis=-1)

    residual = jnp.einsum("bji,bjk->bik", R, Rgt)
    trace = jnp.trace(residual, axis1=-2, axis2=-1)
    cos_r = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    R_err = jnp.degrees(jnp.arccos(cos_r))

    return {
        "t_err_ang": t_ang_err[:, 0],
        "t_err_scale": t_scale_err[:, 0],
        "t_err_scale_sym": t_scale_err_sym[:, 0],
        "t_err_euc": t_euclidean_err[:, 0],
        "R_err": R_err,
    }


def vcre(
    R: jnp.ndarray, t: jnp.ndarray, Tgt: jnp.ndarray, K0: jnp.ndarray, H: int = 720, W: int = 540
) -> jnp.ndarray:
    """Virtual Correspondences Reprojection Error, (B,).

    Matches reference ``vcre_torch`` (metrics.py:83-125): residual transform
    inv(cam2w_gt) @ cam2w_est over the 7x4x7 eye grid, projections clipped to
    the image, mean point distance.
    """
    B = R.shape[0]
    eye = jnp.asarray(_EYE_COORDS, jnp.float32)[None]  # (1, 196, 4)
    eye = jnp.broadcast_to(eye, (B, eye.shape[1], 4))

    uv_gt = project_2d(eye[:, :, :3], K0)

    Rgt = Tgt[:, :3, :3]
    tgt = Tgt[:, :3, 3]
    # residual = inv(cam2w_gt) @ cam2w_est: rotation Rgt^T R, translation Rgt^T (t - tgt)
    Rres = jnp.einsum("bji,bjk->bik", Rgt, R)
    tres = jnp.einsum("bji,bj->bi", Rgt, t[:, 0] - tgt)
    eyes_residual = jnp.einsum("bij,bnj->bni", Rres, eye[:, :, :3]) + tres[:, None, :]
    uv_pred = project_2d(eyes_residual, K0)

    clip = lambda uv: jnp.stack(
        [jnp.clip(uv[..., 0], 0, W), jnp.clip(uv[..., 1], 0, H)], axis=-1
    )
    uv_gt, uv_pred = clip(uv_gt), clip(uv_pred)
    err = jnp.sqrt(jnp.sum((uv_gt - uv_pred) ** 2, axis=-1) + 1e-6)
    return jnp.mean(err, axis=-1)


def error_auc(errors: np.ndarray, thresholds) -> Dict[str, float]:
    """Recall-AUC under error thresholds (reference metrics.py:129-146)."""
    errors = np.nan_to_num(np.asarray(errors, np.float64), nan=float("inf"))
    errors = np.array([0] + sorted(errors.tolist()))
    recall = np.linspace(0, 1, len(errors))
    aucs = {}
    for thr in thresholds:
        last = np.searchsorted(errors, thr)
        y = np.r_[recall[:last], recall[max(last - 1, 0)]]
        x = np.r_[errors[:last], thr]
        aucs[f"auc@{thr}"] = float(np.trapezoid(y, x) / thr)
    return aucs


def a_metrics(t_scale_err_sym: np.ndarray):
    """A1/A2/A3 scale-accuracy metrics (reference metrics.py:181-194)."""
    thresh = np.asarray(t_scale_err_sym)
    return tuple(float((thresh < 1.25**k).mean()) for k in (1, 2, 3))


class MetricsAccumulator:
    """Accumulate per-batch metric dicts; aggregate to flat numpy arrays."""

    def __init__(self):
        self.data = defaultdict(list)

    def accumulate(self, d: Dict[str, np.ndarray]):
        for k, v in d.items():
            self.data[k].append(np.asarray(v).reshape(-1))

    def aggregate(self) -> Dict[str, np.ndarray]:
        return {k: np.concatenate(v) for k, v in self.data.items()}


def ecdf(x: np.ndarray):
    """Empirical CDF (reference metrics.py:149-153): returns (values, cdf)."""
    cd = np.linspace(0, 1, np.asarray(x).shape[0])
    v = np.sort(np.asarray(x))
    return v, cd


def precision(agg_metrics: Dict[str, np.ndarray], rot_threshold: float, trans_threshold: float) -> float:
    """Ratio of samples within both thresholds (reference metrics.py:173-178)."""
    mask_rot = np.asarray(agg_metrics["R_err"]) <= rot_threshold
    mask_trans = np.asarray(agg_metrics["t_err_euc"]) <= trans_threshold
    return float((mask_rot * mask_trans).mean())


def print_auc_table(agg_metrics: Dict[str, np.ndarray]) -> None:
    """Console AUC summary (reference metrics.py:156-170)."""
    pose_err = np.maximum(np.asarray(agg_metrics["R_err"]), np.asarray(agg_metrics["t_err_ang"]))
    a = error_auc(pose_err, (5, 10, 20))
    print("Pose error AUC @ 5/10/20deg: {0:.3f}/{1:.3f}/{2:.3f}".format(*a.values()))
    a = error_auc(agg_metrics["R_err"], (5, 10, 20))
    print("Rotation error AUC @ 5/10/20deg: {0:.3f}/{1:.3f}/{2:.3f}".format(*a.values()))
    a = error_auc(agg_metrics["t_err_ang"], (5, 10, 20))
    print("Translation angular error AUC @ 5/10/20deg: {0:.3f}/{1:.3f}/{2:.3f}".format(*a.values()))
    a = error_auc(agg_metrics["t_err_euc"], (0.1, 0.5, 1))
    print("Translation Euclidean error AUC @ 0.1/0.5/1m: {0:.3f}/{1:.3f}/{2:.3f}".format(*a.values()))
