"""Fused hypothesis-scoring kernel parity (Pallas interpret mode on CPU).

Locks ops/hypothesis_scoring.py against geometry.soft_inlier_counting_3d —
the XLA form of reference ``training_utils.py:55-61`` scoring used by
``probabilisticProcrustes.py:259-275`` — including hypothesis padding (R not
a sublane multiple) and the solver-level integration path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mickey_tpu.geometry import soft_inlier_counting_3d
from mickey_tpu.ops.hypothesis_scoring import fused_hypothesis_scores, hypothesis_scores


def _problem(b=2, r=100, s=256, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.normal(size=(b, s, 3)).astype(np.float32) + [0, 0, 3])
    Y = jnp.asarray(rng.normal(size=(b, s, 3)).astype(np.float32) + [0, 0, 3])
    # random-ish rotations (not exactly orthonormal — the kernel must not care)
    q = rng.normal(size=(b, r, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(b, r, 3, 3).astype(np.float32)
    t = rng.normal(size=(b, r, 1, 3)).astype(np.float32) * 0.3
    return X, Y, jnp.asarray(R), jnp.asarray(t)


class TestFusedHypothesisScoring:
    @pytest.mark.parametrize("r", [100, 96, 7])  # 100 -> pad 104; 7 -> pad 8
    @pytest.mark.parametrize("th", [0.3, 0.15])
    def test_matches_xla_reference(self, r, th):
        X, Y, R, t = _problem(r=r)
        ref = soft_inlier_counting_3d(X[:, None], Y[:, None], R, t, th=th)[..., 0]
        out = fused_hypothesis_scores(X, Y, R, t, th=th, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)

    def test_flat_translation_shape(self):
        X, Y, R, t = _problem(r=16)
        ref = fused_hypothesis_scores(X, Y, R, t, interpret=True)
        out = fused_hypothesis_scores(X, Y, R, t.reshape(2, 16, 3), interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_dispatcher_cpu_fallback_matches_kernel(self):
        X, Y, R, t = _problem(r=24)
        xla = hypothesis_scores(X, Y, R, t, 0.3, use_pallas=False)
        kern = hypothesis_scores(X, Y, R, t, 0.3, use_pallas=True, interpret=True)
        np.testing.assert_allclose(np.asarray(kern), np.asarray(xla), rtol=1e-5, atol=1e-4)


class TestSolverIntegration:
    def test_estimate_pose_kernel_matches_xla_path(self):
        """Same key -> the kernel-scored solver must select the same poses as
        the XLA-scored solver (scores agree to fp noise; argmax ties are
        vanishingly unlikely with continuous scores)."""
        from mickey_tpu.solver.procrustes_ransac import estimate_pose

        rng = np.random.default_rng(5)
        B, N = 2, 48
        kps = jnp.asarray(rng.uniform(10, 90, (B, N, 2)).astype(np.float32))
        d0 = jnp.asarray(rng.uniform(1, 5, (B, N, 1)).astype(np.float32))
        d1 = jnp.asarray(rng.uniform(1, 5, (B, N, 1)).astype(np.float32))
        scores = jnp.asarray(rng.uniform(0.01, 1, (B, N, N)).astype(np.float32))
        K = jnp.tile(jnp.asarray([[[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]]], jnp.float32), (B, 1, 1))
        kw = dict(it_matches=2, it_ransac=8, num_samples=16, num_corr=3,
                  num_refinements=2)
        key = jax.random.PRNGKey(0)
        ref = estimate_pose(key, scores, kps, d0, kps, d1, K, K, **kw)
        out = estimate_pose(key, scores, kps, d0, kps, d1, K, K,
                            use_pallas_scoring=True, pallas_interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(out.R), np.asarray(ref.R), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out.confidence), np.asarray(ref.confidence), rtol=1e-4
        )
