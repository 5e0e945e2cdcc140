"""Parity: fused Pallas dual-softmax kernel vs the XLA reference path.

Runs the kernel in Pallas interpret mode on CPU; the XLA path
(``nn/matcher.py::dual_softmax``) is itself golden-locked to the torch
reference in tests/test_parity_heads.py, so kernel == XLA == reference.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mickey_tpu.config import default_config
from mickey_tpu.nn.matcher import dual_softmax
from mickey_tpu.ops.fused_matcher import fused_dual_softmax


def _descs(rng, b, n, c):
    d = rng.normal(size=(b, n, c)).astype(np.float32)
    return jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))


@pytest.mark.parametrize("use_dustbin", [True, False])
@pytest.mark.parametrize(
    "shape",
    [
        (2, 20, 20, 16),  # tiny, unaligned
        (1, 300, 260, 128),  # multi-tile M, unaligned M/N, production C
    ],
)
def test_fused_matches_xla(rng, use_dustbin, shape):
    b, m, n, c = shape
    dsc0 = _descs(rng, b, m, c)
    dsc1 = _descs(rng, b, n, c)

    cfg = default_config()
    cfg.FEATURE_MATCHER.DUAL_SOFTMAX.USE_DUSTBIN = use_dustbin
    dustbin = jnp.float32(0.7)
    params = {"dustbin_score": dustbin} if use_dustbin else {}

    ref = dual_softmax(params, dsc0, dsc1, cfg)
    out = fused_dual_softmax(
        dsc0,
        dsc1,
        dustbin,
        temperature=float(cfg.FEATURE_MATCHER.DUAL_SOFTMAX.TEMPERATURE),
        use_dustbin=use_dustbin,
        block_m=128,
        interpret=True,
    )
    assert out.shape == (b, m, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("use_dustbin", [True, False])
@pytest.mark.parametrize(
    "shape",
    [
        (2, 20, 20, 16),  # tiny, unaligned
        (1, 300, 260, 128),  # multi-tile M, unaligned M/N, production C
    ],
)
def test_fused_vjp_matches_xla_grads(rng, use_dustbin, shape):
    """Analytic Pallas backward == jax.grad of the dense XLA dual-softmax,
    for dsc0, dsc1 AND the dustbin logit."""
    from mickey_tpu.ops.fused_matcher import fused_dual_softmax_vjp

    b, m, n, c = shape
    dsc0 = _descs(rng, b, m, c)
    dsc1 = _descs(rng, b, n, c)
    G = jnp.asarray(rng.normal(size=(b, m, n)).astype(np.float32))

    cfg = default_config()
    cfg.FEATURE_MATCHER.DUAL_SOFTMAX.USE_DUSTBIN = use_dustbin
    dustbin = jnp.float32(0.7)
    params = {"dustbin_score": dustbin} if use_dustbin else {}
    temp = float(cfg.FEATURE_MATCHER.DUAL_SOFTMAX.TEMPERATURE)

    def loss_ref(d0, d1, a):
        p = dict(params)
        if use_dustbin:
            p["dustbin_score"] = a
        return jnp.sum(dual_softmax(p, d0, d1, cfg) * G)

    def loss_fused(d0, d1, a):
        out = fused_dual_softmax_vjp(
            d0, d1, a, temperature=temp, use_dustbin=use_dustbin,
            block_m=128, interpret=True,
        )
        return jnp.sum(out * G)

    v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(dsc0, dsc1, dustbin)
    v_f, g_f = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(dsc0, dsc1, dustbin)
    np.testing.assert_allclose(float(v_f), float(v_ref), rtol=1e-5)
    for a, b_ in zip(g_f[:2], g_ref[:2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5, rtol=1e-4)
    if use_dustbin:
        np.testing.assert_allclose(float(g_f[2]), float(g_ref[2]), atol=2e-5, rtol=1e-4)
    else:
        assert float(g_f[2]) == 0.0


def test_bf16_descriptor_gate(rng):
    """Distribution-level gate for cfg.TPU.MATCHER_BF16 (VERDICT r2 item 9).

    bf16 descriptors perturb the correlation logits by ~0.04 after the 1/T=10
    scaling; this gate checks the perturbation is immaterial WHERE IT MATTERS:
    the downstream RANSAC pose and soft-inlier confidence on a peaked,
    geometry-consistent synthetic scene (the production regime — dual-softmax
    match distributions are extremely peaked). Both variants must recover the
    ground-truth pose, the mutual-argmax match structure must agree, and
    confidences must agree to a few percent.
    """
    from test_ransac import SOLVER_KW, make_scene

    from mickey_tpu.solver import estimate_pose

    B, N, C = 2, 128, 128
    inputs, (R_gt, t_gt) = make_scene(rng, B=B, N=N, outlier_frac=0.25)

    # descriptors realizing the scene's i<->i correspondence with realistic
    # (non-saturated) peaks: dsc1 is a noisy copy of dsc0, L2-normalized
    d0 = rng.normal(size=(B, N, C)).astype(np.float32)
    d1 = (d0 + 0.35 * rng.normal(size=(B, N, C))).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d0, d1 = jnp.asarray(d0), jnp.asarray(d1)

    kw = dict(temperature=0.1, use_dustbin=True, block_m=128, interpret=True)
    dustbin = jnp.float32(1.0)
    s32 = fused_dual_softmax(d0, d1, dustbin, **kw)
    s16 = fused_dual_softmax(
        d0.astype(jnp.bfloat16), d1.astype(jnp.bfloat16), dustbin, **kw
    )

    # match structure: row/col argmaxes identical
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(s16, axis=2)), np.asarray(jnp.argmax(s32, axis=2))
    )
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(s16, axis=1)), np.asarray(jnp.argmax(s32, axis=1))
    )

    key = jax.random.PRNGKey(0)
    geom = {k: v for k, v in inputs.items() if k != "final_scores"}
    e32 = estimate_pose(key, final_scores=s32, **geom, **SOLVER_KW)
    e16 = estimate_pose(key, final_scores=s16, **geom, **SOLVER_KW)

    for est in (e32, e16):
        assert bool(jnp.all(est.valid))
        R, t = np.asarray(est.R), np.asarray(est.t)
        for b in range(B):
            cosang = (np.trace(R[b].T @ R_gt[b]) - 1) / 2
            rot_err_deg = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
            assert rot_err_deg < 1.5, rot_err_deg
            assert np.linalg.norm(t[b] - t_gt[b]) < 0.05
    c32, c16 = np.asarray(e32.confidence), np.asarray(e16.confidence)
    np.testing.assert_allclose(c16, c32, rtol=0.05)


def test_fused_probability_mass(rng):
    """Scores stay in (0, 1] and behave like the dual-softmax product."""
    dsc0 = _descs(rng, 1, 64, 32)
    out = fused_dual_softmax(
        dsc0, dsc0, jnp.float32(1.0), temperature=0.1, block_m=128, interpret=True
    )
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1 + 1e-6).all()
    # self-matching: diagonal dominates
    assert (o[0].argmax(axis=1) == np.arange(64)).mean() > 0.9


class TestFusedTopK:
    """fused_topk_scores: the matcher->top-K route (the dense score matrix
    never reaches HBM). Gates: bitwise parity of the selected (value, index)
    table vs the dense oracle, recall vs the true global top-P, and validity
    semantics matching the solver's dense row_ok."""

    def _inputs(self, rng, b, m, n, c):
        from mickey_tpu.ops.fused_matcher import fused_dual_softmax

        d0 = _descs(rng, b, m, c)
        d1 = _descs(rng, b, n, c)
        s0 = jnp.asarray(rng.uniform(0, 1, (b, m)).astype(np.float32))
        s1 = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(np.float32))
        dustbin = jnp.float32(0.7)
        dense = fused_dual_softmax(
            d0, d1, dustbin, temperature=0.1, use_dustbin=True, block_m=128, interpret=True
        )
        final = dense * s0[:, :, None] * s1[:, None, :]
        return d0, d1, s0, s1, dustbin, final

    @pytest.mark.parametrize("shape", [(2, 20, 24, 16), (1, 300, 260, 64)])
    def test_matches_dense_oracle(self, rng, shape):
        from mickey_tpu.ops.fused_matcher import dense_topk_scores, fused_topk_scores

        b, m, n, c = shape
        d0, d1, s0, s1, dustbin, final = self._inputs(rng, b, m, n, c)
        P, L = 48, 8
        ov, oi, ook = dense_topk_scores(final, P, row_topl=L)
        fv, fi, fok = fused_topk_scores(
            d0, d1, s0, s1, dustbin, P,
            temperature=0.1, use_dustbin=True, row_topl=L, block_m=128, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(ook), np.asarray(fok))
        np.testing.assert_allclose(np.asarray(fv), np.asarray(ov), atol=1e-6, rtol=1e-5)
        # index agreement modulo exact-tie reordering: compare as sets where
        # values are distinct (random inputs -> ties only at padded zeros)
        for bb in range(b):
            assert set(np.asarray(fi)[bb].tolist()) == set(np.asarray(oi)[bb].tolist())

    def test_recall_vs_true_topk(self, rng):
        """Candidate recall >= the dense route's approx_max_k recall_target
        (0.95) even on worst-case diffuse random scores; mass recall higher."""
        from mickey_tpu.ops.fused_matcher import fused_topk_scores

        d0, d1, s0, s1, dustbin, final = self._inputs(rng, 1, 300, 260, 64)
        P, L = 512, 8
        tv, ti = jax.lax.top_k(final.reshape(1, -1), P)
        fv, fi, _ = fused_topk_scores(
            d0, d1, s0, s1, dustbin, P,
            temperature=0.1, use_dustbin=True, row_topl=L, block_m=128, interpret=True,
        )
        got = set(np.asarray(fi)[0].tolist())
        recall = len(got & set(np.asarray(ti)[0].tolist())) / P
        assert recall >= 0.95, recall
        mass = sum(float(v) for v, i in zip(np.asarray(tv)[0], np.asarray(ti)[0]) if int(i) in got)
        assert mass / float(np.asarray(tv)[0].sum()) >= 0.99

    def test_validity_stats(self, rng):
        """Non-finite descriptors must flip row_ok exactly like the dense
        row_ok reduction (solver/procrustes_ransac.py)."""
        from mickey_tpu.ops.fused_matcher import fused_topk_scores

        d0, d1, s0, s1, dustbin, _ = self._inputs(rng, 2, 20, 24, 16)
        d0 = d0.at[0, 3, :].set(jnp.nan)  # pair 0 poisoned, pair 1 fine
        _, _, ok = fused_topk_scores(
            d0, d1, s0, s1, dustbin, 16,
            temperature=0.1, use_dustbin=True, row_topl=4, block_m=128, interpret=True,
        )
        ok = np.asarray(ok)
        assert not ok[0] and ok[1]

    def test_zero_scores_invalid(self, rng):
        from mickey_tpu.ops.fused_matcher import fused_topk_scores

        d0, d1, _, _, dustbin, _ = self._inputs(rng, 1, 20, 24, 16)
        z = jnp.zeros((1, 20), jnp.float32)
        z1 = jnp.zeros((1, 24), jnp.float32)
        _, _, ok = fused_topk_scores(
            d0, d1, z, z1, dustbin, 16,
            temperature=0.1, use_dustbin=True, row_topl=4, block_m=128, interpret=True,
        )
        assert not np.asarray(ok)[0]


class TestFusedTopKTrain:
    """fused_topk_scores_train: the matcher->top-K TRAINING route. The dense
    match matrix is needed in neither direction because log(final score) is
    linear in the correlation logit and the two logsumexps (block comment in
    ops/fused_matcher.py). Gates: forward table/lse parity vs the dense
    fallback, analytic lse VJP vs autodiff of the dense logsumexps, and
    end-to-end gradient consistency of metric_pose_loss_topk vs the dense
    metric_pose_loss with injected identical samples."""

    def _inputs(self, rng, b, m, n, c):
        d0 = _descs(rng, b, m, c)
        d1 = _descs(rng, b, n, c)
        s0 = jnp.asarray(rng.uniform(0.1, 1, (b, m)).astype(np.float32))
        s1 = jnp.asarray(rng.uniform(0.1, 1, (b, n)).astype(np.float32))
        return d0, d1, s0, s1, jnp.float32(0.7)

    @pytest.mark.parametrize("use_dustbin", [True, False])
    @pytest.mark.parametrize("shape", [(2, 20, 24, 16), (1, 300, 260, 64)])
    def test_forward_matches_dense(self, rng, use_dustbin, shape):
        from mickey_tpu.ops.fused_matcher import (
            dense_topk_scores_train,
            fused_topk_scores_train,
        )

        b, m, n, c = shape
        d0, d1, s0, s1, dustbin = self._inputs(rng, b, m, n, c)
        P, L = 48, 8
        kw = dict(temperature=0.1, use_dustbin=use_dustbin, row_topl=L)
        ov, oi, ook, olr, olc = dense_topk_scores_train(d0, d1, s0, s1, dustbin, P, **kw)
        fv, fi, fok, flr, flc = fused_topk_scores_train(
            d0, d1, s0, s1, dustbin, P, block_m=128, interpret=True, **kw
        )
        np.testing.assert_array_equal(np.asarray(ook), np.asarray(fok))
        np.testing.assert_allclose(np.asarray(fv), np.asarray(ov), atol=1e-6, rtol=1e-5)
        for bb in range(b):
            assert set(np.asarray(fi)[bb].tolist()) == set(np.asarray(oi)[bb].tolist())
        np.testing.assert_allclose(np.asarray(flr), np.asarray(olr), atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(flc), np.asarray(olc), atol=1e-5, rtol=1e-5)

    @pytest.mark.parametrize("use_dustbin", [True, False])
    @pytest.mark.parametrize("shape", [(2, 20, 24, 16), (1, 300, 260, 64)])
    def test_lse_vjp_matches_dense_grads(self, rng, use_dustbin, shape):
        """Analytic streaming lse backward == jax.grad of the dense
        logsumexps, for dsc0, dsc1 AND the dustbin logit."""
        from mickey_tpu.ops.fused_matcher import dense_lse, fused_topk_scores_train

        b, m, n, c = shape
        d0, d1, s0, s1, dustbin = self._inputs(rng, b, m, n, c)
        wr = jnp.asarray(rng.normal(size=(b, m)).astype(np.float32))
        wc = jnp.asarray(rng.normal(size=(b, n)).astype(np.float32))

        def loss_dense(d0, d1, a):
            lr, lc = dense_lse(d0, d1, a, 0.1, use_dustbin)
            return jnp.sum(wr * lr) + jnp.sum(wc * lc)

        def loss_fused(d0, d1, a):
            _, _, _, lr, lc = fused_topk_scores_train(
                d0, d1, s0, s1, a, 16,
                temperature=0.1, use_dustbin=use_dustbin, row_topl=4,
                block_m=128, interpret=True,
            )
            return jnp.sum(wr * lr) + jnp.sum(wc * lc)

        ref = jax.grad(loss_dense, argnums=(0, 1, 2))(d0, d1, dustbin)
        got = jax.grad(loss_fused, argnums=(0, 1, 2))(d0, d1, dustbin)
        for r, g, name in zip(ref, got, ("dsc0", "dsc1", "dustbin")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=2e-5, rtol=1e-4, err_msg=name
            )

    def test_loss_topk_grad_matches_dense(self, rng):
        """metric_pose_loss_topk == metric_pose_loss gradients with injected
        identical samples, w.r.t. every trainable input (descriptors,
        detection scores, dustbin, keypoints, depths)."""
        from mickey_tpu.nn.matcher import dual_softmax
        from mickey_tpu.config import default_config
        from mickey_tpu.ops.fused_matcher import dense_topk_scores_train
        from mickey_tpu.training.loss import (
            LossConfig,
            metric_pose_loss,
            metric_pose_loss_topk,
        )

        b, m, n, c = 2, 30, 28, 16
        it, r_it, s_n, corr_n = 3, 2, 10, 4
        temp = 0.1
        d0, d1, s0v, s1v, dustbin = self._inputs(rng, b, m, n, c)
        s0 = s0v[..., None]
        s1 = s1v[..., None]
        kps0 = jnp.asarray(rng.uniform(0, 100, (b, m, 2)).astype(np.float32))
        kps1 = jnp.asarray(rng.uniform(0, 100, (b, n, 2)).astype(np.float32))
        dep0 = jnp.asarray(rng.uniform(1, 5, (b, m, 1)).astype(np.float32))
        dep1 = jnp.asarray(rng.uniform(1, 5, (b, n, 1)).astype(np.float32))
        K = np.zeros((b, 3, 3), np.float32)
        K[:, 0, 0] = K[:, 1, 1] = 120.0
        K[:, 0, 2] = K[:, 1, 2] = 50.0
        K[:, 2, 2] = 1.0
        K = jnp.asarray(K)
        ang = 0.2
        Rgt = jnp.asarray(
            np.stack(
                [
                    np.array(
                        [
                            [np.cos(ang), -np.sin(ang), 0],
                            [np.sin(ang), np.cos(ang), 0],
                            [0, 0, 1],
                        ],
                        np.float32,
                    )
                ]
                * b
            )
        )
        tgt = jnp.asarray(rng.normal(size=(b, 1, 3)).astype(np.float32))

        lc = LossConfig(
            it_matches=it, it_ransac=r_it, num_ref_steps=2, num_corr=corr_n,
            num_samples_matches=s_n, train_with_topk=True,
        )
        idx = jnp.asarray(
            rng.integers(0, m * n, size=(b, it, s_n)).astype(np.int32)
        )
        ridx = jnp.asarray(
            rng.integers(0, s_n, size=(b, it, r_it, corr_n)).astype(np.int32)
        )
        key = jax.random.PRNGKey(0)
        topk_pct = jnp.float32(60.0)
        cfg = default_config()
        cfg.FEATURE_MATCHER.DUAL_SOFTMAX.TEMPERATURE = temp

        def loss_dense(d0, d1, a, s0, s1, kps0, dep0, kps1, dep1):
            fs = dual_softmax({"dustbin_score": a}, d0, d1, cfg)
            fs = fs * s0 * jnp.swapaxes(s1, 1, 2)
            total, _ = metric_pose_loss(
                fs, kps0, dep0, kps1, dep1, K, K, K, K, Rgt, tgt,
                key, lc, topk_pct, sample_override=(idx, ridx),
            )
            return total

        def loss_topk(d0, d1, a, s0, s1, kps0, dep0, kps1, dep1):
            tk = dense_topk_scores_train(
                d0, d1, s0[..., 0], s1[..., 0], a, 64,
                temperature=temp, use_dustbin=True, row_topl=8,
            )
            total, _ = metric_pose_loss_topk(
                tk, d0, d1, s0, s1, kps0, dep0, kps1, dep1, K, K, K, K,
                Rgt, tgt, key, lc, topk_pct, temperature=temp,
                sample_override=(idx, ridx),
            )
            return total

        args = (d0, d1, dustbin, s0, s1, kps0, dep0, kps1, dep1)
        v_ref, g_ref = jax.value_and_grad(loss_dense, argnums=tuple(range(9)))(*args)
        v_got, g_got = jax.value_and_grad(loss_topk, argnums=tuple(range(9)))(*args)
        np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
        names = ("dsc0", "dsc1", "dustbin", "scr0", "scr1", "kps0", "dep0", "kps1", "dep1")
        for r, g, name in zip(g_ref, g_got, names):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=3e-5, rtol=2e-4, err_msg=name
            )
