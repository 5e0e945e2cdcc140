"""VCRE reprojection error (pure numpy, offline evaluator).

Counterpart of reference ``benchmark/reprojection.py``: virtual eye grid
7x4x7 at 0.3 m step with 1.8 m z-offset, projected through the residual
transform between estimated and ground-truth cam2world poses.
"""

from __future__ import annotations

import numpy as np

from ..geometry.rotations import quat2mat


def project(pts: np.ndarray, K: np.ndarray, img_size=None) -> np.ndarray:
    """Project (N, 3|4) camera-frame points with K (3, 3); optional clamping."""
    assert pts.ndim == 2 and pts.shape[1] in (3, 4)
    uv_h = (K @ pts[:, :3].T).T
    uv = uv_h[:, :2] / uv_h[:, -1:]
    if img_size is not None:
        uv[:, 0] = np.clip(uv[:, 0], 0, img_size[0])
        uv[:, 1] = np.clip(uv[:, 1], 0, img_size[1])
    return uv


def get_grid_multipleheight() -> np.ndarray:
    """7x4x7 homogeneous eye-coordinate grid (reference reprojection.py:32-56)."""
    step, nx, ny, nz, z_off, y_off = 0.3, 7, 4, 7, 1.8, 0.0
    xs = (np.arange(nx) - (nx - 1) / 2) * step
    ys = (np.arange(ny) - (ny - 1) / 2) * step + y_off
    zs = np.arange(nz).astype(float) * step + z_off
    xx, yy, zz = np.meshgrid(xs, ys, zs)
    ones = np.ones(xx.size)
    return np.concatenate([c.reshape(-1, 1) for c in (xx, yy, zz, ones)], axis=-1)


eye_coords_glob = get_grid_multipleheight()


def reprojection_error(q_est, t_est, q_gt, t_gt, K, W, H) -> float:
    """Mean VCRE for one frame; q/t are cam2world (reference :63-87)."""
    eye = eye_coords_glob
    uv_gt = project(eye, K, (W, H))

    cam2w_est = np.eye(4)
    cam2w_est[:3, :3] = quat2mat(q_est)
    cam2w_est[:3, -1] = t_est
    cam2w_gt = np.eye(4)
    cam2w_gt[:3, :3] = quat2mat(q_gt)
    cam2w_gt[:3, -1] = t_gt

    eyes_residual = (np.linalg.inv(cam2w_est) @ cam2w_gt @ eye.T).T
    uv_pred = project(eyes_residual, K, (W, H))
    return float(np.linalg.norm(uv_gt - uv_pred, ord=2, axis=1).mean())
