from .procrustes_ransac import (
    PoseEstimate,
    estimate_pose,
    estimate_pose_from_cfg,
    estimate_pose_topk,
    estimate_pose_topk_from_cfg,
    extract_inliers,
)

__all__ = [
    "PoseEstimate",
    "estimate_pose",
    "estimate_pose_from_cfg",
    "estimate_pose_topk",
    "estimate_pose_topk_from_cfg",
    "extract_inliers",
]
