"""Stage-level decomposition of the training-loss forward on the TPU.

Times the three phases of metric_pose_loss as separately-jitted programs at
the production operating point (N=1938, budget 20x20x512, prefilter 4096):

  sample: prefilter + batched outer Gumbel top-k + coordinate gathers +
          backprojection + inner minimal-set sampling
  refine: num_ref_steps x (weighted Procrustes + inlier counting) under
          stop_grad over (B, it, R_it, S) point sets
  score:  grad-carrying re-solve + soft inliers + VCRE losses + softmax
          aggregation + surrogate

Each stage returns one scalar (tunnel-safe timing); inputs vary per iter.

Usage: python tools/bench_loss_stages.py [--iters 5]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--n", type=int, default=1938)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from mickey_tpu.config import default_config
    from mickey_tpu.geometry import (
        inlier_counting_3d,
        soft_inlier_counting_3d,
        weighted_procrustes,
    )
    from mickey_tpu.geometry.projection import backproject_3d
    from mickey_tpu.geometry.rotations import quat2mat
    from mickey_tpu.ops.sampling import gumbel_topk_sample
    from mickey_tpu.training.loss import LossConfig, _take, _NEG_INF
    from mickey_tpu.training.loss_utils import compute_vcre_loss
    from mickey_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = default_config()
    lc = LossConfig.from_cfg(cfg)
    B, N = args.batch, args.n
    it, R_it, S, C = lc.it_matches, lc.it_ransac, lc.num_samples_matches, lc.num_corr
    rng = np.random.default_rng(0)

    fs = jnp.asarray((rng.uniform(0, 1, (B, N, N)) ** 8).astype(np.float32))
    kps = jnp.asarray(rng.uniform(0, 500, (B, N, 2)).astype(np.float32))
    dep = jnp.asarray(rng.uniform(1, 5, (B, N, 1)).astype(np.float32))
    K = np.zeros((B, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 550
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = 266, 357, 1
    T = np.zeros((B, 3, 3), np.float32)
    tvec = np.zeros((B, 1, 3), np.float32)
    for b in range(B):
        q = rng.normal(size=4)
        T[b] = quat2mat(q / np.linalg.norm(q))
        tvec[b, 0] = rng.normal(size=3) * 0.3
    K, T, tvec = map(jnp.asarray, (K, T, tvec))

    def sample_stage(fs, key, eps):
        fs = fs * (1 + eps)
        matches = fs.reshape(B, N * N)
        key_outer, key_inner = jax.random.split(key)
        top_scores, top_idx = jax.lax.approx_max_k(matches, lc.prefilter, recall_target=0.95)
        logw = jnp.where(top_scores > 0, jnp.log(jnp.maximum(top_scores, 1e-30)), _NEG_INF)
        logw_all = jnp.broadcast_to(logw[None], (it,) + logw.shape)
        idx = jnp.moveaxis(gumbel_topk_sample(key_outer, logw_all, S), 0, 1)
        idx = jnp.take_along_axis(
            top_idx.astype(jnp.int32), idx.reshape(B, it * S), axis=1
        ).reshape(B, it, S)
        idx0, idx1 = idx // N, idx % N
        X = backproject_3d(_take(idx0, kps), _take(idx0, dep), K[:, None])
        Y = backproject_3d(_take(idx1, kps), _take(idx1, dep), K[:, None])
        w = _take(idx, matches[..., None])[..., 0]
        logw_in = jnp.where(w > 0, jnp.log(jnp.maximum(w, 1e-30)), _NEG_INF)
        logw_in = jnp.broadcast_to(logw_in[:, :, None, :], (B, it, R_it, S))
        ridx = gumbel_topk_sample(key_inner, logw_in, C)
        return jnp.sum(X) + jnp.sum(Y) + jnp.sum(ridx), (X, Y, w, ridx, idx)

    # fixed sampled tensors for the later stages (computed once)
    _, (X, Y, w, ridx, idx) = jax.jit(lambda fs, key: sample_stage(fs, key, jnp.float32(0)))(
        fs, jax.random.PRNGKey(0)
    )
    X, Y, ridx = map(jax.block_until_ready, (X, Y, ridx))

    minimal0 = jnp.sum(jax.nn.one_hot(ridx, S, dtype=jnp.float32), axis=-2)

    def refine_stage(X, Y, eps):
        Xd, Yd = X[:, :, None] * (1 + eps), Y[:, :, None]
        inliers = minimal0
        for _ in range(lc.num_ref_steps):
            sol = weighted_procrustes(Xd, Yd, w=inliers, use_weights=True, use_mask=True)
            inliers = inlier_counting_3d(Xd, Yd, sol.R, sol.t, th=lc.inlier_ref_th)
        return jnp.sum(inliers)

    def score_stage(X, Y, eps):
        Xe = X[:, :, None] * (1 + eps)
        Ye = Y[:, :, None]
        sol = weighted_procrustes(Xe, Ye, w=minimal0, use_weights=True, use_mask=True)
        score_k = soft_inlier_counting_3d(Xe, Ye, sol.R, sol.t, th=lc.inlier_3d_th)[..., 0]
        flat = lambda a: a.reshape((B * it * R_it,) + a.shape[3:])
        tile = lambda a: jnp.broadcast_to(
            a[:, None, None], (B, it, R_it) + a.shape[1:]
        ).reshape((B * it * R_it,) + a.shape[1:])
        lv, lr, lt = compute_vcre_loss(
            flat(sol.R), flat(sol.t), tile(T), tile(tvec), tile(K), tile(K),
            soft_clipping=lc.soft_clipping,
        )
        lv = lv.reshape(B, it, R_it)
        wsoft = jax.nn.softmax(score_k / lc.score_temperature, axis=-1)
        return jnp.sum(lv * wsoft)

    stages = [
        ("sample", jax.jit(lambda fs, key, eps: sample_stage(fs, key, eps)[0]),
         lambda i: (fs, jax.random.fold_in(jax.random.PRNGKey(0), i), jnp.float32(1e-9 * i))),
        ("refine", jax.jit(refine_stage), lambda i: (X, Y, jnp.float32(1e-9 * i))),
        ("score", jax.jit(score_stage), lambda i: (X, Y, jnp.float32(1e-9 * i))),
    ]
    for name, f, mk in stages:
        v = float(f(*mk(0)))
        t0 = time.perf_counter()
        for i in range(args.iters):
            v = float(f(*mk(i + 1)))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:8s} {dt*1e3:8.1f} ms/batch-{B}  v={v:.3e}", flush=True)


if __name__ == "__main__":
    main()
