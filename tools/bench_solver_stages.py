"""Solver stage decomposition on the real chip (same-process A/B deltas).

The RANSAC solver is ~24% of the shared-layout inference chain (BENCHLOG
round 3); this maps where its time goes by differencing variants of
``estimate_pose`` with individual stages dialed to zero/minimum:

  full            : production budget (it_matches x it_ransac x S, refine R)
  refine0         : num_refinements=0          -> delta = refinement cost
  ransac1         : it_ransac=1, refine0       -> delta = hypothesis+scoring
  exact (pf=0)    : prefilter off              -> delta = prefilter savings

Deltas between same-process medians; every variant fetches one scalar per
iteration with varied inputs (tunnel-safe timing, CLAUDE.md).

Usage: python tools/bench_solver_stages.py [--iters 8] [--batch 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument(
        "--tiny", action="store_true",
        help="tiny operating point on CPU (script smoke test, not a benchmark)",
    )
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
    from mickey_tpu.solver.procrustes_ransac import estimate_pose

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
    final_scores = corr.scores * corr.kp_scores
    pc = cfg.PROCRUSTES
    base = dict(
        final_scores=final_scores, kps0=corr.kps0, depth0=corr.depth0,
        kps1=corr.kps1, depth1=corr.depth1, K0=K, K1=K,
        it_matches=int(pc.IT_MATCHES), it_ransac=int(pc.IT_RANSAC),
        num_samples=int(pc.NUM_SAMPLED_MATCHES), num_corr=int(pc.NUM_CORR_3D_3D),
        num_refinements=int(pc.NUM_REFINEMENTS), th_inlier=float(pc.TH_INLIER),
        th_soft_inlier=float(pc.TH_SOFT_INLIER),
        prefilter=int(cfg.TPU.get("SAMPLING_PREFILTER", 0)),
        use_pallas_scoring=bool(cfg.TPU.get("USE_PALLAS_SCORING", True)),
    )
    key = jax.random.PRNGKey(0)

    def timeit(name, kw):
        def one(i):
            e = estimate_pose(jax.random.fold_in(key, i), **kw)
            return float(jnp.sum(e.confidence))

        one(0)  # compile + warm
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            v = one(i + 1)
            ts.append(time.perf_counter() - t0)
            assert np.isfinite(v)
        med = float(np.median(ts)) * 1e3
        print(f"{name:22s} {med:8.1f} ms/batch-{B} (mean {1e3*np.mean(ts):7.1f})", flush=True)
        return med

    t_full = timeit("full", base)
    t_ref0 = timeit("refine0", dict(base, num_refinements=0))
    t_r1 = timeit("ransac1+refine0", dict(base, num_refinements=0, it_ransac=1))
    t_exact = timeit("exact(prefilter=0)", dict(base, prefilter=0))

    print(f"\ndeltas (same-process): refinement={t_full-t_ref0:.1f} ms  "
          f"hypgen+scoring={t_ref0-t_r1:.1f} ms  "
          f"sampling+base={t_r1:.1f} ms (incl. ~RTT)  "
          f"prefilter saves={t_exact-t_full:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
