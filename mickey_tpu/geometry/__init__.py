from .projection import backproject_3d, project_2d, transform_points, inv_intrinsics
from .kabsch import svd3x3, weighted_procrustes, ProcrustesResult
from .inliers import (
    soft_inlier_counting_3d,
    inlier_counting_3d,
    soft_inlier_counting_2d,
    pairwise_distance,
)
from .rotations import qinverse, qmult, rotate_vector, quat2mat, mat2quat, quat2mat_jax

__all__ = [
    "backproject_3d",
    "project_2d",
    "transform_points",
    "inv_intrinsics",
    "svd3x3",
    "weighted_procrustes",
    "ProcrustesResult",
    "soft_inlier_counting_3d",
    "inlier_counting_3d",
    "soft_inlier_counting_2d",
    "pairwise_distance",
    "qinverse",
    "qmult",
    "rotate_vector",
    "quat2mat",
    "mat2quat",
    "quat2mat_jax",
]
