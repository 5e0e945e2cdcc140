"""Geometry layer tests: projection, Kabsch/SVD3x3, inlier counting, quats.

Golden values come from independent numpy implementations (and torch where it
exercises the exact reference semantics, e.g. weighted Procrustes variants).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mickey_tpu.geometry import (
    backproject_3d,
    project_2d,
    svd3x3,
    weighted_procrustes,
    soft_inlier_counting_3d,
    inlier_counting_3d,
    qinverse,
    qmult,
    quat2mat,
    mat2quat,
    rotate_vector,
    quat2mat_jax,
)


def random_rotation(rng):
    q = rng.normal(size=4)
    return quat2mat(q / np.linalg.norm(q))


def make_K(rng, B):
    K = np.zeros((B, 3, 3), dtype=np.float32)
    K[:, 0, 0] = rng.uniform(400, 800, B)
    K[:, 1, 1] = rng.uniform(400, 800, B)
    K[:, 0, 2] = rng.uniform(200, 400, B)
    K[:, 1, 2] = rng.uniform(200, 400, B)
    K[:, 2, 2] = 1.0
    return K


class TestProjection:
    def test_backproject_project_roundtrip(self, rng):
        B, N = 4, 64
        K = make_K(rng, B)
        uv = rng.uniform(0, 500, (B, N, 2)).astype(np.float32)
        depth = rng.uniform(0.5, 10, (B, N, 1)).astype(np.float32)
        xyz = backproject_3d(jnp.array(uv), jnp.array(depth), jnp.array(K))
        uv2 = project_2d(xyz, jnp.array(K))
        np.testing.assert_allclose(np.asarray(uv2), uv, rtol=1e-4, atol=1e-2)

    def test_backproject_matches_numpy_inverse(self, rng):
        B, N = 2, 16
        K = make_K(rng, B)
        uv = rng.uniform(0, 500, (B, N, 2)).astype(np.float32)
        depth = rng.uniform(0.5, 10, (B, N, 1)).astype(np.float32)
        xyz = np.asarray(backproject_3d(jnp.array(uv), jnp.array(depth), jnp.array(K)))
        for b in range(B):
            uv1 = np.concatenate([uv[b], np.ones((N, 1), np.float32)], -1)
            expected = depth[b] * (np.linalg.inv(K[b]) @ uv1.T).T
            np.testing.assert_allclose(xyz[b], expected, rtol=1e-4, atol=1e-4)


class TestSVD3x3:
    @pytest.mark.parametrize("seed", range(5))
    def test_reconstruction_random(self, seed):
        rng = np.random.default_rng(seed)
        H = rng.normal(size=(64, 3, 3)).astype(np.float32)
        U, S, V = svd3x3(jnp.array(H))
        U, S, V = map(np.asarray, (U, S, V))
        recon = np.einsum("bij,bj,bkj->bik", U, S, V)
        np.testing.assert_allclose(recon, H, atol=2e-5)
        # singular values match numpy, sorted descending
        S_np = np.linalg.svd(H, compute_uv=False)
        np.testing.assert_allclose(S, S_np, atol=2e-5)
        assert (np.diff(S, axis=-1) <= 1e-6).all()
        # U, V orthonormal
        eye = np.broadcast_to(np.eye(3, dtype=np.float32), (64, 3, 3))
        np.testing.assert_allclose(np.einsum("bij,bik->bjk", U, U), eye, atol=2e-5)
        np.testing.assert_allclose(np.einsum("bij,bik->bjk", V, V), eye, atol=2e-5)

    def test_rank_deficient(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(8, 3, 1)).astype(np.float32)
        b = rng.normal(size=(8, 1, 3)).astype(np.float32)
        c = rng.normal(size=(8, 3, 1)).astype(np.float32)
        d = rng.normal(size=(8, 1, 3)).astype(np.float32)
        H = a @ b + c @ d  # rank <= 2
        U, S, V = map(np.asarray, svd3x3(jnp.array(H)))
        recon = np.einsum("bij,bj,bkj->bik", U, S, V)
        np.testing.assert_allclose(recon, H, atol=3e-5)
        assert np.abs(S[:, 2]).max() < 1e-4

    def test_zero_matrix_no_nan(self):
        H = jnp.zeros((2, 3, 3))
        U, S, V = svd3x3(H)
        assert np.isfinite(np.asarray(U)).all()
        assert np.isfinite(np.asarray(V)).all()

    def test_zero_and_tiny_matrix_grad_no_nan(self):
        """Backward regression: at H == 0 the gap regularizer's relative term
        underflows to 0 in fp32, and an unfloored D/(D*D+reg) is 0/0 = NaN.
        Hit in training when score collapse makes all sampled correspondences
        coincident (round 4); apply_if_finite then froze the params forever."""
        import jax

        def f(H):
            U, S, V = svd3x3(H)
            return jnp.sum(U) + jnp.sum(S) + jnp.sum(V)

        for scale in (0.0, 1e-20, 1e-8):
            H = jnp.full((2, 3, 3), scale, jnp.float32)
            g = jax.grad(f)(H)
            assert np.isfinite(np.asarray(g)).all(), scale


class TestProcrustes:
    def _make_problem(self, rng, B=8, N=32, noise=0.0):
        R = np.stack([random_rotation(rng) for _ in range(B)]).astype(np.float32)
        t = rng.normal(size=(B, 1, 3)).astype(np.float32)
        A = rng.normal(size=(B, N, 3)).astype(np.float32) * 3
        Bp = np.einsum("bij,bnj->bni", R, A) + t + noise * rng.normal(size=(B, N, 3)).astype(np.float32)
        return A, Bp, R, t

    def test_exact_recovery_unweighted(self, rng):
        A, B_, R, t = self._make_problem(rng)
        res = weighted_procrustes(jnp.array(A), jnp.array(B_), use_weights=False)
        np.testing.assert_allclose(np.asarray(res.R), R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.t), t, atol=1e-4)
        assert np.asarray(res.valid).all()

    def test_minimal_3point(self, rng):
        A, B_, R, t = self._make_problem(rng, B=16, N=3)
        res = weighted_procrustes(jnp.array(A), jnp.array(B_), use_weights=False)
        np.testing.assert_allclose(np.asarray(res.R), R, atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.t), t, atol=1e-3)

    def test_weighted_mask_selects_inliers(self, rng):
        A, B_, R, t = self._make_problem(rng, B=4, N=64)
        B_noisy = B_.copy()
        B_noisy[:, 40:] += rng.normal(size=(4, 24, 3)).astype(np.float32) * 5
        w = np.zeros((4, 64), dtype=np.float32)
        w[:, :40] = 1.0
        res = weighted_procrustes(
            jnp.array(A), jnp.array(B_noisy), w=jnp.array(w), use_weights=True, use_mask=True
        )
        np.testing.assert_allclose(np.asarray(res.R), R, atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.t), t, atol=1e-3)

    def test_matches_torch_reference_semantics(self, rng):
        """Golden test vs a faithful numpy re-derivation of solvers.py."""
        A, B_, _, _ = self._make_problem(rng, B=6, N=16, noise=0.3)
        w = rng.uniform(0.1, 1.0, (6, 16)).astype(np.float32)

        def np_weighted_procrustes(A, B, w, use_mask):
            eps = 1e-16
            W1 = np.abs(w).sum(1, keepdims=True)
            w_norm = (w / (W1 + eps))[..., None]
            a_mean = (w_norm * A).sum(1, keepdims=True)
            b_mean = (w_norm * B).sum(1, keepdims=True)
            A_c, B_c = A - a_mean, B - b_mean
            cov_w = w[..., None] if use_mask else w_norm
            H = np.einsum("bni,bnj->bij", A_c, cov_w * B_c)
            U, S, Vt = np.linalg.svd(H)
            V = np.transpose(Vt, (0, 2, 1))
            Z = np.broadcast_to(np.eye(3), H.shape).copy()
            Z[:, 2, 2] = np.sign(np.linalg.det(np.einsum("bij,bkj->bik", U, V)))
            R = np.einsum("bij,bjk,blk->bil", V, Z, U)
            t = b_mean - np.einsum("bni,bji->bnj", a_mean, R)
            return R, t

        for use_mask in (False, True):
            Rg, tg = np_weighted_procrustes(A, B_, w, use_mask)
            res = weighted_procrustes(
                jnp.array(A), jnp.array(B_), w=jnp.array(w), use_weights=True, use_mask=use_mask
            )
            np.testing.assert_allclose(np.asarray(res.R), Rg.astype(np.float32), atol=1e-4)
            np.testing.assert_allclose(np.asarray(res.t), tg.astype(np.float32), atol=1e-4)

    def test_degenerate_collinear_flagged_invalid(self, rng):
        # all points on a line -> rank-1 covariance
        d = rng.normal(size=(2, 1, 3)).astype(np.float32)
        s = rng.normal(size=(2, 10, 1)).astype(np.float32)
        A = s * d
        B_ = A.copy()
        res = weighted_procrustes(jnp.array(A), jnp.array(B_), use_weights=False)
        assert not np.asarray(res.valid).any()
        assert np.isfinite(np.asarray(res.R)).all()

    def test_differentiable(self, rng):
        A, B_, _, _ = self._make_problem(rng, B=2, N=8, noise=0.1)

        def loss(A):
            res = weighted_procrustes(A, jnp.array(B_), use_weights=False)
            return jnp.sum(res.R) + jnp.sum(res.t)

        g = jax.grad(loss)(jnp.array(A))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestInliers:
    def test_counts(self, rng):
        B, N = 3, 100
        X0 = rng.normal(size=(B, N, 3)).astype(np.float32)
        R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
        t = np.zeros((B, 1, 3), dtype=np.float32)
        X1 = X0.copy()
        X1[:, 50:] += 10.0
        hard = np.asarray(inlier_counting_3d(jnp.array(X0), jnp.array(X1), jnp.array(R), jnp.array(t), th=0.5))
        assert hard.shape == (B, N)
        assert (hard[:, :50] == 1).all() and (hard[:, 50:] == 0).all()
        soft = np.asarray(
            soft_inlier_counting_3d(jnp.array(X0), jnp.array(X1), jnp.array(R), jnp.array(t), th=0.5)
        )
        assert soft.shape == (B, 1)
        # ~50 near-perfect inliers each (sigmoid(5/th * th) ≈ 0.993 at dist sqrt(1e-6))
        assert np.all(np.abs(soft - 50.0) < 1.0)

    def test_soft_count_matches_formula(self, rng):
        B, N = 2, 7
        X0 = rng.normal(size=(B, N, 3)).astype(np.float32)
        X1 = rng.normal(size=(B, N, 3)).astype(np.float32)
        R = np.stack([random_rotation(rng) for _ in range(B)]).astype(np.float32)
        t = rng.normal(size=(B, 1, 3)).astype(np.float32)
        th = 0.3
        got = np.asarray(soft_inlier_counting_3d(*map(jnp.array, (X0, X1, R, t)), th=th))
        Xt = np.einsum("bij,bnj->bni", R, X0) + t
        dist = np.sqrt(((Xt - X1) ** 2).sum(-1) + 1e-6)
        expected = (1 / (1 + np.exp(-(5 / th) * (th - dist)))).sum(-1, keepdims=True)
        np.testing.assert_allclose(got, expected, rtol=1e-5)


class TestQuaternions:
    def test_roundtrip(self, rng):
        for _ in range(20):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            if q[0] < 0:
                q = -q
            R = quat2mat(q)
            q2 = mat2quat(R)
            np.testing.assert_allclose(q2, q, atol=1e-10)

    def test_qmult_matches_matrix_product(self, rng):
        q1, q2 = rng.normal(size=4), rng.normal(size=4)
        q1 /= np.linalg.norm(q1)
        q2 /= np.linalg.norm(q2)
        np.testing.assert_allclose(quat2mat(qmult(q1, q2)), quat2mat(q1) @ quat2mat(q2), atol=1e-10)

    def test_qinverse(self, rng):
        q = rng.normal(size=4)
        out = qmult(q, qinverse(q))
        np.testing.assert_allclose(out, [1, 0, 0, 0], atol=1e-10)

    def test_rotate_vector(self, rng):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        v = rng.normal(size=3)
        np.testing.assert_allclose(rotate_vector(v, q), quat2mat(q) @ v, atol=1e-10)

    def test_quat2mat_jax_matches_numpy(self, rng):
        qs = rng.normal(size=(16, 4)).astype(np.float32)
        Rj = np.asarray(quat2mat_jax(jnp.array(qs)))
        for i in range(16):
            np.testing.assert_allclose(Rj[i], quat2mat(qs[i]), atol=1e-5)


class TestSVDGradients:
    def test_custom_vjp_matches_autodiff_through_jacobi(self):
        """On well-conditioned inputs the analytic VJP must equal
        differentiating through the Jacobi iteration."""
        import jax
        from mickey_tpu.geometry.kabsch import _svd3x3_primal, svd3x3

        rng = np.random.default_rng(3)
        H = jnp.array(rng.normal(size=(16, 3, 3)).astype(np.float32))

        def loss_custom(H):
            U, S, V = svd3x3(H)
            return jnp.sum(U * jnp.cos(S)[..., None, :]) + jnp.sum(V * V[..., ::-1, :]) + jnp.sum(S**2)

        def loss_jacobi(H):
            U, S, V = _svd3x3_primal(H)
            return jnp.sum(U * jnp.cos(S)[..., None, :]) + jnp.sum(V * V[..., ::-1, :]) + jnp.sum(S**2)

        g1 = np.asarray(jax.grad(loss_custom)(H))
        g2 = np.asarray(jax.grad(loss_jacobi)(H))
        np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-4)

    def test_grad_finite_on_rank_deficient(self):
        import jax
        from mickey_tpu.geometry.kabsch import svd3x3

        rng = np.random.default_rng(4)
        a = rng.normal(size=(8, 3, 1)).astype(np.float32)
        b = rng.normal(size=(8, 1, 3)).astype(np.float32)
        H = jnp.array(a @ b)  # rank 1

        def loss(H):
            U, S, V = svd3x3(H)
            return jnp.sum(U) + jnp.sum(S) + jnp.sum(V)

        g = np.asarray(jax.grad(loss)(H))
        assert np.isfinite(g).all()

    def test_procrustes_grad_finite_on_duplicate_points(self):
        """Minimal sets with duplicated keypoints (rank-1 covariance) must not
        poison gradients — the failure mode that motivated the custom VJP."""
        import jax
        from mickey_tpu.geometry import weighted_procrustes

        rng = np.random.default_rng(5)
        A = rng.normal(size=(2, 4, 3)).astype(np.float32)
        A[:, 2] = A[:, 0]  # duplicates
        A[:, 3] = A[:, 1]
        B_ = rng.normal(size=(2, 4, 3)).astype(np.float32)

        def loss(A):
            res = weighted_procrustes(A, jnp.array(B_), use_weights=False)
            return jnp.sum(res.R) + jnp.sum(res.t)

        g = np.asarray(jax.grad(loss)(jnp.array(A)))
        assert np.isfinite(g).all()
