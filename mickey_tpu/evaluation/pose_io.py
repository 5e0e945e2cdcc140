"""Pose file IO + precision/recall for the offline Map-free evaluator.

Counterpart of reference ``benchmark/utils.py``: world2cam text poses ->
cam2world, quaternion angle errors (sin and cos variants), confidence-ranked
precision/recall AUC.
"""

from __future__ import annotations

import logging
import typing
from pathlib import Path

import numpy as np

from ..geometry.rotations import qinverse, qmult, rotate_vector

VARIANTS_ANGLE_SIN = "sin"
VARIANTS_ANGLE_COS = "cos"


def convert_world2cam_to_cam2world(q, t):
    qinv = qinverse(q)
    tinv = -rotate_vector(t, qinv)
    return qinv, tinv


def load_poses(file: typing.IO, load_confidence: bool = False):
    """Parse ``imgpath qw qx qy qz tx ty tz [confidence]`` lines into
    {frame_num: (q_c2w, t_c2w, confidence)} (reference benchmark/utils.py:18-78).
    """
    expected_parts = 9 if load_confidence else 8
    poses = {}
    for line_number, line in enumerate(file.readlines()):
        parts = tuple(line.strip().split(" "))
        if len(parts) != expected_parts:
            logging.warning(
                f"Invalid number of fields line {line_number}: expected {expected_parts}, got {len(parts)}."
            )
            continue
        name = parts[0]
        if "#" in name:
            continue
        try:
            frame_num = int(name[-9:-4])
        except ValueError:
            logging.warning(f"Invalid frame number line {line_number}.")
            continue
        try:
            vals = tuple(map(float, parts[1:]))
            if any(np.isnan(v) or np.isinf(v) for v in vals):
                raise ValueError
            qw, qx, qy, qz, tx, ty, tz = vals[:7]
            confidence = vals[7] if load_confidence else None
        except ValueError:
            logging.warning(f"Error parsing pose line {line_number}.")
            continue
        q = np.array((qw, qx, qy, qz), dtype=np.float64)
        t = np.array((tx, ty, tz), dtype=np.float64)
        if np.isclose(np.linalg.norm(q), 0):
            logging.warning(f"Zero-norm quaternion line {line_number}.")
            continue
        q, t = convert_world2cam_to_cam2world(q, t)
        poses[frame_num] = (q, t, confidence)
    return poses


def subsample_poses(poses: dict, subsample: int = 1):
    return {k: v for i, (k, v) in enumerate(poses.items()) if i % subsample == 0}


def load_K(file_path: Path):
    """intrinsics.txt -> ({frame: K}, W, H) (reference benchmark/utils.py:85-96)."""
    K = {}
    W = H = None
    with Path(file_path).open("r", encoding="utf-8") as f:
        for line in f.readlines():
            if "#" in line:
                continue
            parts = line.strip().split(" ")
            frame_num = int(parts[0][-9:-4])
            fx, fy, cx, cy, W, H = map(float, parts[1:])
            K[frame_num] = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float32)
    return K, W, H


def quat_angle_error(label, pred, variant=VARIANTS_ANGLE_SIN) -> np.ndarray:
    """Angle between quaternions, degrees; sin variant is precise for small
    angles (reference benchmark/utils.py:99-133)."""
    assert np.asarray(label).shape == (4,) and np.asarray(pred).shape == (4,)
    label = np.asarray(label, np.float64)[None]
    pred = np.asarray(pred, np.float64)[None]
    q1 = pred / np.linalg.norm(pred, axis=1, keepdims=True)
    q2 = label / np.linalg.norm(label, axis=1, keepdims=True)
    if variant == VARIANTS_ANGLE_COS:
        d = np.abs(np.sum(q1 * q2, axis=1, keepdims=True))
        d = np.clip(d, -1.0, 1.0)
        angle = 2.0 * np.degrees(np.arccos(d))
    else:
        sine = qmult(q1[0], qinverse(q2[0]))
        angle = np.arcsin(np.linalg.norm(sine[1:], keepdims=True)) * 114.59155902616465
        angle = angle[None]
    return angle.astype(np.float64)


def precision_recall(inliers, tp, failures):
    """Confidence-ranked precision/recall + average precision
    (reference benchmark/utils.py:136-186)."""
    assert len(inliers) == len(tp), "unequal shapes"
    inliers = np.array(inliers)
    sort_idx = np.argsort(inliers)[::-1]
    inliers = inliers[sort_idx]
    tp = np.array(tp).reshape(-1)[sort_idx]

    distinct = np.where(np.diff(inliers))[0]
    threshold_idxs = np.r_[distinct, inliers.size - 1]

    N = inliers.shape[0]
    rec = np.arange(N, dtype=np.float32) + 1
    cum_tp = np.cumsum(tp)
    prec = cum_tp[threshold_idxs] / rec[threshold_idxs]
    rec = rec[threshold_idxs] / (float(N) + float(failures))

    last_ind = rec.searchsorted(rec[-1])
    sl = slice(last_ind, None, -1)
    prec = np.r_[prec[sl], 1]
    rec = np.r_[rec[sl], 0]
    average_precision = np.abs(np.sum(np.diff(rec) * np.array(prec)[:-1]))
    return prec, rec, average_precision
