from .mapfree import aggregate_results, compute_scene_metrics, evaluate
from .metrics import Inputs, MetricManager
from .pose_io import (
    VARIANTS_ANGLE_COS,
    VARIANTS_ANGLE_SIN,
    convert_world2cam_to_cam2world,
    load_K,
    load_poses,
    precision_recall,
    quat_angle_error,
    subsample_poses,
)
from .reprojection import get_grid_multipleheight, project, reprojection_error

__all__ = [
    "aggregate_results",
    "compute_scene_metrics",
    "evaluate",
    "Inputs",
    "MetricManager",
    "VARIANTS_ANGLE_COS",
    "VARIANTS_ANGLE_SIN",
    "convert_world2cam_to_cam2world",
    "load_K",
    "load_poses",
    "precision_recall",
    "quat_angle_error",
    "subsample_poses",
    "get_grid_multipleheight",
    "project",
    "reprojection_error",
]
