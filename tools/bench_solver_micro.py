"""Micro-decomposition of the solver's sampling+base cost (same process).

bench_solver_stages.py showed the solver's time is NOT in hypotheses,
scoring, or refinement (2+13 ms of ~92) — it is in the 'base': dispatch RTT,
the row_ok validity passes over the (B, 3.7M) score matrix, the approx_max_k
prefilter, and the batched outer Gumbel draws. This times each cumulative
prefix as its own jitted program, scalar-fetch synced, varied by a traced
scalar so no stage can be constant-folded:

  floor     : return s (dispatch + fetch RTT floor)
  row_ok    : validity reductions over the full score matrix
  prefilter : + approx_max_k(B, N0*N1 -> P)
  outer     : + batched Gumbel top-k draws (it, B, P -> S) + remap
  gather    : + LEGACY per-draw kps/depth gathers + backprojection on the
              it*S sampled rows — the PRE-round-3 structure, kept so the
              restructure's win stays re-measurable; it no longer matches
              the shipped solver, so do NOT read full-minus-gather as the
              current solver's tail cost
  gather_tables : + the CURRENT structure (backproject the N keypoints once
              into (B, N, 3) tables, gather 3-wide rows per draw) — use this
              prefix for attribution against `full`
  full      : estimate_pose (entire solver)

Usage: python tools/bench_solver_micro.py [--iters 12] [--batch 16]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=12)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--tiny", action="store_true")
    args = parser.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mickey_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from mickey_tpu.config import default_config
    from mickey_tpu.models import relative_pose as rp
    from mickey_tpu.nn.extractor import model_init
    from mickey_tpu.ops.sampling import gumbel_topk_sample_draws
    from mickey_tpu.solver.procrustes_ransac import _log_weights, estimate_pose
    from mickey_tpu.geometry.projection import backproject_3d

    cfg = default_config()
    if args.tiny:
        cfg.MICKEY.DINOV2.VARIANT = "vit_small"
        cfg.MICKEY.DINOV2.CHANNEL_DIM = 384
        cfg.MICKEY.DINOV2.FLOAT16 = False
        cfg.MICKEY.KP_HEADS.BLOCKS_DIM = [32, 16, 128, 8]
        cfg.MICKEY.DSC_HEAD.LAST_DIM = 16
        cfg.PROCRUSTES.IT_MATCHES = 2
        cfg.PROCRUSTES.IT_RANSAC = 8
        cfg.PROCRUSTES.NUM_SAMPLED_MATCHES = 12
        cfg.PROCRUSTES.NUM_CORR_3D_3D = 3
        cfg.PROCRUSTES.NUM_REFINEMENTS = 2
    params = model_init(jax.random.PRNGKey(0), cfg)
    cfg_id = id(cfg)
    rp._CFG_REGISTRY[cfg_id] = cfg

    B, H, W = args.batch, 714, 532
    if args.tiny:
        B, H, W = 2, 126, 112
    rng = np.random.default_rng(0)
    im0 = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    im1 = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    K = np.zeros((B, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 550
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = W / 2, H / 2, 1
    K = jnp.asarray(K)

    corr = rp._staged_correspondences(params, im0, im1, cfg_id)
    final_scores = (corr.scores * corr.kp_scores).astype(jnp.float32)
    kps0, depth0 = corr.kps0, corr.depth0
    kps1, depth1 = corr.kps1, corr.depth1
    pc = cfg.PROCRUSTES
    it, S = int(pc.IT_MATCHES), int(pc.NUM_SAMPLED_MATCHES)
    P = int(cfg.TPU.get("SAMPLING_PREFILTER", 4096))
    key = jax.random.PRNGKey(0)

    Bq, N0, N1 = final_scores.shape

    @jax.jit
    def f_floor(fs, s):
        return s + 1.0

    @jax.jit
    def f_rowok(fs, s):
        flat = fs.reshape(Bq, N0 * N1) + s * 1e-30
        row_ok = (
            jnp.all(jnp.isfinite(flat), axis=-1)
            & jnp.all(flat >= 0, axis=-1)
            & (jnp.sum(flat, axis=-1) > 0)
        )
        return jnp.sum(row_ok.astype(jnp.float32))

    @jax.jit
    def f_prefilter(fs, s):
        flat = fs.reshape(Bq, N0 * N1) + s * 1e-30
        top_scores, top_idx = jax.lax.approx_max_k(flat, P, recall_target=0.95)
        return jnp.sum(top_scores) + jnp.sum(top_idx.astype(jnp.float32) * 1e-9)

    def f_outer_impl(fs, s, k):
        flat = fs.reshape(Bq, N0 * N1) + s * 1e-30
        top_scores, top_idx = jax.lax.approx_max_k(flat, P, recall_target=0.95)
        logw = _log_weights(top_scores)
        outer_idx = gumbel_topk_sample_draws(k, logw, S, it)  # (it, B, S)
        remap = top_idx.astype(jnp.int32)
        outer_idx = jnp.take_along_axis(
            jnp.broadcast_to(remap[None], (it,) + remap.shape), outer_idx, axis=2
        )
        return outer_idx

    @jax.jit
    def f_outer(fs, s, k):
        return jnp.sum(f_outer_impl(fs, s, k).astype(jnp.float32) * 1e-9)

    @jax.jit
    def f_gather_tables(fs, s, k):
        # CURRENT solver structure (procrustes_ransac.py round 3+): 3D point
        # tables built once on the N keypoints, 3-wide gathers per draw
        outer_idx = f_outer_impl(fs, s, k)
        idx_flat = jnp.swapaxes(outer_idx, 0, 1).reshape(Bq, it * S)
        idx0 = idx_flat // N1
        idx1 = idx_flat % N1
        X_all = backproject_3d(kps0, depth0, K)
        Y_all = backproject_3d(kps1, depth1, K)
        X = jnp.take_along_axis(X_all, idx0[..., None], axis=1)
        Y = jnp.take_along_axis(Y_all, idx1[..., None], axis=1)
        return jnp.sum(X) * 1e-9 + jnp.sum(Y) * 1e-9

    @jax.jit
    def f_gather(fs, s, k):
        # LEGACY pre-round-3 structure (see module docstring)
        outer_idx = f_outer_impl(fs, s, k)
        idx_flat = jnp.swapaxes(outer_idx, 0, 1).reshape(Bq, it * S)
        idx0 = idx_flat // N1
        idx1 = idx_flat % N1
        cor0 = jnp.take_along_axis(kps0, idx0[..., None], axis=1)
        cor1 = jnp.take_along_axis(kps1, idx1[..., None], axis=1)
        d0 = jnp.take_along_axis(depth0, idx0[..., None], axis=1)
        d1 = jnp.take_along_axis(depth1, idx1[..., None], axis=1)
        X = backproject_3d(cor0, d0, K)
        Y = backproject_3d(cor1, d1, K)
        return jnp.sum(X) * 1e-9 + jnp.sum(Y) * 1e-9

    def f_full(i):
        e = estimate_pose(
            jax.random.fold_in(key, i), final_scores, kps0, depth0, kps1, depth1,
            K, K,
            it_matches=it, it_ransac=int(pc.IT_RANSAC), num_samples=S,
            num_corr=int(pc.NUM_CORR_3D_3D), num_refinements=int(pc.NUM_REFINEMENTS),
            th_inlier=float(pc.TH_INLIER), th_soft_inlier=float(pc.TH_SOFT_INLIER),
            prefilter=P, use_pallas_scoring=bool(cfg.TPU.get("USE_PALLAS_SCORING", True)),
        )
        return jnp.sum(e.confidence)

    def timeit(name, fn):
        float(fn(0))  # compile + warm
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            v = float(fn(i + 1))
            ts.append(time.perf_counter() - t0)
            assert np.isfinite(v)
        med = float(np.median(ts)) * 1e3
        print(f"{name:12s} {med:8.1f} ms/batch-{Bq} (mean {1e3*np.mean(ts):7.1f})", flush=True)
        return med

    timeit("floor", lambda i: f_floor(final_scores, jnp.float32(i)))
    timeit("row_ok", lambda i: f_rowok(final_scores, jnp.float32(i)))
    timeit("prefilter", lambda i: f_prefilter(final_scores, jnp.float32(i)))
    timeit("outer", lambda i: f_outer(final_scores, jnp.float32(i), jax.random.fold_in(key, i)))
    timeit("gather", lambda i: f_gather(final_scores, jnp.float32(i), jax.random.fold_in(key, i)))
    timeit("gather_tables", lambda i: f_gather_tables(final_scores, jnp.float32(i), jax.random.fold_in(key, i)))
    timeit("full", f_full)


if __name__ == "__main__":
    main()
