"""Offline Map-free benchmark evaluator (pure numpy).

Counterpart of reference ``benchmark/mapfree.py``: evaluates a
submission.zip of per-scene pose files against ground truth, reporting
Average Median Translation/Rotation/Reprojection Error, Precision & AUC at
pose error < (25cm, 5deg) and VCRE < 90px, and estimate coverage.

Run: ``python -m mickey_tpu.evaluation.mapfree --submission_path ... \
       --dataset_path ... --split val``
"""

from __future__ import annotations

import argparse
import json
import logging
from collections import defaultdict
from io import TextIOWrapper
from pathlib import Path
from zipfile import ZipFile

import numpy as np

from .metrics import Inputs, MetricManager
from .pose_io import load_K, load_poses, precision_recall, subsample_poses

# acceptance thresholds (reference benchmark/config.py)
t_threshold = 0.25  # meters
R_threshold = 5  # degrees
vcre_threshold = 90  # pixels


def compute_scene_metrics(dataset_path: Path, submission_zip: ZipFile, scene: str):
    metric_manager = MetricManager()

    K, W, H = load_K(dataset_path / scene / "intrinsics.txt")
    with (dataset_path / scene / "poses.txt").open("r", encoding="utf-8") as f:
        gt_poses = load_poses(f, load_confidence=False)

    try:
        with submission_zip.open(f"pose_{scene}.txt") as est_file:
            estimated_poses = load_poses(TextIOWrapper(est_file, encoding="utf-8"), load_confidence=True)
    except KeyError:
        logging.warning(f"Submission does not have estimates for scene {scene}.")
        return dict(), len(gt_poses)

    # val/test query frames are subsampled x5 (reference mapfree.py:59)
    gt_poses = subsample_poses(gt_poses, subsample=5)

    failures = 0
    results = defaultdict(list)
    for frame_num, (q_gt, t_gt, _) in gt_poses.items():
        if frame_num not in estimated_poses:
            failures += 1
            continue
        q_est, t_est, confidence = estimated_poses[frame_num]
        inputs = Inputs(
            q_gt=q_gt, t_gt=t_gt, q_est=q_est, t_est=t_est,
            confidence=confidence, K=K[frame_num], W=W, H=H,
        )
        metric_manager(inputs, results)
    return results, failures


def aggregate_results(all_results, all_failures):
    median_metrics = defaultdict(list)
    all_metrics = defaultdict(list)
    for scene_results in all_results.values():
        for metric, values in scene_results.items():
            median_metrics[metric].append(np.median(values))
            all_metrics[metric].extend(values)
    all_metrics = {k: np.array(v) for k, v in all_metrics.items()}
    assert all(v.ndim == 1 for v in all_metrics.values()), "invalid metrics shape"

    avg_median_metrics = {m: np.mean(v) for m, v in median_metrics.items()}

    accepted_poses = (all_metrics["trans_err"] < t_threshold) * (all_metrics["rot_err"] < R_threshold)
    accepted_vcre = all_metrics["reproj_err"] < vcre_threshold
    total_samples = len(next(iter(all_metrics.values()))) + all_failures

    prec_pose = np.sum(accepted_poses) / total_samples
    prec_vcre = np.sum(accepted_vcre) / total_samples

    pose_prec, pose_rec, auc_pose = precision_recall(
        inliers=all_metrics["confidence"], tp=accepted_poses, failures=all_failures
    )
    vcre_prec, vcre_rec, auc_vcre = precision_recall(
        inliers=all_metrics["confidence"], tp=accepted_vcre, failures=all_failures
    )

    curves = {
        "vcre_prec_values": vcre_prec,
        "vcre_recall_values": vcre_rec,
        "pose_prec_values": pose_prec,
        "pose_recall_values": pose_rec,
    }

    out = {
        "Average Median Translation Error": avg_median_metrics["trans_err"],
        "Average Median Rotation Error": avg_median_metrics["rot_err"],
        "Average Median Reprojection Error": avg_median_metrics["reproj_err"],
        f"Precision @ Pose Error < ({t_threshold*100}cm, {R_threshold}deg)": prec_pose,
        f"AUC @ Pose Error < ({t_threshold*100}cm, {R_threshold}deg)": auc_pose,
        f"Precision @ VCRE < {vcre_threshold}px": prec_vcre,
        f"AUC @ VCRE < {vcre_threshold}px": auc_vcre,
        "Estimates for % of frames": len(all_metrics["trans_err"]) / total_samples,
    }
    return out, curves


def evaluate(submission_path: Path, dataset_path: Path):
    scenes = tuple(f.name for f in dataset_path.iterdir() if f.is_dir())
    submission_zip = ZipFile(submission_path, "r")

    all_results, all_failures = {}, 0
    for scene in scenes:
        metrics, failures = compute_scene_metrics(dataset_path, submission_zip, scene)
        all_results[scene] = metrics
        all_failures += failures

    if all((len(m) == 0 for m in all_results.values())):
        raise RuntimeError("Submission does not have any valid pose estimates")
    return aggregate_results(all_results, all_failures)


def main():
    parser = argparse.ArgumentParser("eval", description="Evaluate Map-free submissions")
    parser.add_argument("--submission_path", type=Path, required=True)
    parser.add_argument("--split", choices=("val", "test"), default="test")
    parser.add_argument("--dataset_path", type=Path, required=True, help="dataset root (without split)")
    parser.add_argument("--log", choices=("warning", "info", "error"), default="warning")
    args = parser.parse_args()

    logging.basicConfig(level=args.log.upper())
    output_metrics, _ = evaluate(args.submission_path, args.dataset_path / args.split)
    print(json.dumps(output_metrics, indent=2, default=float))


if __name__ == "__main__":
    main()
