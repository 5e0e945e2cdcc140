"""Production-shape statistical gate: fused top-K route vs dense route on chip.

The fused matcher->top-K route's bitwise/recall gates run at toy shapes in
interpret mode (tests/test_fused_matcher.py) and the e2e route parity is
CPU-only; this tool closes the gap VERDICT r4 named: at the production
operating point (B=16 x 4 batches = 64 pairs, M=N=1938, C=128, L=16,
P=4096, full 20x100x2048 RANSAC budget) on the REAL chip, compare the two
routes' pose/confidence distributions. Reference behavior being
approximated: probabilisticProcrustes.py:230-241 (multinomial over the
dense final-score matrix).

Design: the routes share one stochastic solver, so per-pair poses differ
between ANY two runs with different draw pairings. The gate is therefore
noise-floor-relative: the dense-route pose solved with key k2 establishes
the same-distribution noise floor, and the fused route (key k1, same as
dense run 1) must sit within it:

    median_pair angle(R_dense_k1, R_fused_k1)
        <= 1.5 x median_pair angle(R_dense_k1, R_dense_k2)
    (same for translation) and median confidence within 5%.

Also reported: fused-vs-dense top-P table index overlap (the dense route's
own prefilter is approx_max_k at recall_target=0.95, so ~0.95 is healthy).

Inputs are synthetic at the matcher boundary (unit descriptors, uniform
keypoint scores, depths in [1, 10]): the extractor upstream is IDENTICAL in
both routes, and random-weight descriptor geometry at temperature 0.1 is
the same regime the throughput bench measures. Timing rules per CLAUDE.md
(scalar/small fetches only); run ALONE on an idle host.

Usage: python tools/bench_topk_parity.py [--batches 4] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--cpu", action="store_true", help="tiny-shape CPU smoke run")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mickey_tpu.config import default_config
    from mickey_tpu.ops.fused_matcher import fused_topk_scores
    from mickey_tpu.solver.procrustes_ransac import estimate_pose, estimate_pose_topk
    from mickey_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = default_config()
    pc = cfg.PROCRUSTES
    if args.cpu:
        B, M, N, C, L, P = 2, 70, 70, 16, 4, 32
        it_m, it_r, S, corr_n, refs = 2, 4, 12, 3, 1
    else:
        B, M, N, C, L, P = args.batch, 1938, 1938, 128, 16, 4096
        it_m, it_r, S = pc.IT_MATCHES, pc.IT_RANSAC, pc.NUM_SAMPLED_MATCHES
        corr_n, refs = pc.NUM_CORR_3D_3D, pc.NUM_REFINEMENTS
    T = float(cfg.FEATURE_MATCHER.DUAL_SOFTMAX.TEMPERATURE)
    use_dustbin = bool(cfg.FEATURE_MATCHER.DUAL_SOFTMAX.USE_DUSTBIN)

    solver_kw = dict(
        it_matches=it_m, it_ransac=it_r, num_samples=S, num_corr=corr_n,
        num_refinements=refs, th_inlier=pc.TH_INLIER,
        th_soft_inlier=pc.TH_SOFT_INLIER,
    )

    def make_batch(seed):
        rng = np.random.default_rng(seed)
        d0 = rng.normal(size=(B, M, C)).astype(np.float32)
        d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
        d1 = rng.normal(size=(B, N, C)).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
        s0 = rng.uniform(0.05, 1.0, (B, M)).astype(np.float32)
        s0 /= s0.sum(-1, keepdims=True)
        s1 = rng.uniform(0.05, 1.0, (B, N)).astype(np.float32)
        s1 /= s1.sum(-1, keepdims=True)
        kps0 = rng.uniform(0, 532, (B, M, 2)).astype(np.float32)
        kps1 = rng.uniform(0, 532, (B, N, 2)).astype(np.float32)
        dep0 = rng.uniform(1.0, 10.0, (B, M, 1)).astype(np.float32)
        dep1 = rng.uniform(1.0, 10.0, (B, N, 1)).astype(np.float32)
        K = np.zeros((B, 3, 3), np.float32)
        K[:, 0, 0] = K[:, 1, 1] = 550
        K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = 266, 357, 1
        return tuple(jnp.asarray(a) for a in (d0, d1, s0, s1, kps0, kps1, dep0, dep1, K))

    dustbin = jnp.float32(0.0)

    @jax.jit
    def dense_scores(d0, d1, s0, s1):
        # dense route's matcher: dual-softmax matrix x kp-score outer product
        from mickey_tpu.ops.fused_matcher import fused_dual_softmax

        sc = fused_dual_softmax(
            d0, d1, dustbin, temperature=T, use_dustbin=use_dustbin,
            interpret=bool(args.cpu),
        )
        return sc * s0[:, :, None] * s1[:, None, :]

    if args.cpu:
        from mickey_tpu.ops.fused_matcher import dense_topk_scores

        @jax.jit
        def fused_table(d0, d1, s0, s1):
            # CPU smoke path: the XLA selection-semantics oracle
            return dense_topk_scores(dense_scores(d0, d1, s0, s1), P, row_topl=L)
    else:

        @jax.jit
        def fused_table(d0, d1, s0, s1):
            return fused_topk_scores(
                d0, d1, s0, s1, dustbin, P, temperature=T,
                use_dustbin=use_dustbin, row_topl=L,
            )

    @jax.jit
    def rot_angle_deg(Ra, Rb):
        tr = jnp.einsum("bij,bij->b", Ra, Rb)
        cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
        return jnp.degrees(jnp.arccos(cos))

    @jax.jit
    def overlap_frac(idx_a, idx_b):
        # |a ∩ b| / P via sort + searchsorted, on device
        sa = jnp.sort(idx_a, axis=-1)
        pos = jax.vmap(jnp.searchsorted)(sa, idx_b)
        pos = jnp.clip(pos, 0, sa.shape[-1] - 1)
        hit = jnp.take_along_axis(sa, pos, axis=-1) == idx_b
        return jnp.mean(hit.astype(jnp.float32), axis=-1)

    rows = {
        "ang_route": [], "ang_noise": [], "t_route": [], "t_noise": [],
        "conf_dense": [], "conf_fused": [], "overlap": [], "valid_dense": [],
        "valid_fused": [],
    }
    t0 = time.time()
    for bi in range(args.batches):
        d0, d1, s0, s1, kps0, kps1, dep0, dep1, K = make_batch(1000 + bi)
        k1 = jax.random.PRNGKey(42 + bi)
        k2 = jax.random.PRNGKey(9000 + bi)

        fs = dense_scores(d0, d1, s0, s1)
        est_d1 = estimate_pose(k1, fs, kps0, dep0, kps1, dep1, K, K,
                               prefilter=P, **solver_kw)
        est_d2 = estimate_pose(k2, fs, kps0, dep0, kps1, dep1, K, K,
                               prefilter=P, **solver_kw)
        tv, ti, rok = fused_table(d0, d1, s0, s1)
        est_f = estimate_pose_topk(k1, tv, ti, rok, kps0, dep0, kps1, dep1,
                                   K, K, n1=N, **solver_kw)

        # dense route's own prefilter table, for the overlap diagnostic
        flat = fs.reshape(B, -1)
        _, didx = jax.lax.approx_max_k(flat, P, recall_target=0.95)

        rows["ang_route"] += list(np.asarray(rot_angle_deg(est_d1.R, est_f.R)))
        rows["ang_noise"] += list(np.asarray(rot_angle_deg(est_d1.R, est_d2.R)))
        rows["t_route"] += list(
            np.asarray(jnp.linalg.norm((est_d1.t - est_f.t)[:, 0], axis=-1))
        )
        rows["t_noise"] += list(
            np.asarray(jnp.linalg.norm((est_d1.t - est_d2.t)[:, 0], axis=-1))
        )
        rows["conf_dense"] += list(np.asarray(est_d1.confidence))
        rows["conf_fused"] += list(np.asarray(est_f.confidence))
        rows["overlap"] += list(np.asarray(overlap_frac(didx.astype(jnp.int32), ti)))
        rows["valid_dense"] += list(np.asarray(est_d1.valid))
        rows["valid_fused"] += list(np.asarray(est_f.valid))
        print(f"# batch {bi} done ({time.time()-t0:.0f}s)", flush=True)

    med = lambda k: float(np.median(rows[k]))
    out = {
        "pairs": len(rows["ang_route"]),
        "median_rot_delta_route_deg": round(med("ang_route"), 3),
        "median_rot_delta_noise_deg": round(med("ang_noise"), 3),
        "median_t_delta_route_m": round(med("t_route"), 4),
        "median_t_delta_noise_m": round(med("t_noise"), 4),
        "median_conf_dense": round(med("conf_dense"), 3),
        "median_conf_fused": round(med("conf_fused"), 3),
        "mean_table_overlap": round(float(np.mean(rows["overlap"])), 4),
        "valid_dense": int(np.sum(rows["valid_dense"])),
        "valid_fused": int(np.sum(rows["valid_fused"])),
        "wall_s": round(time.time() - t0, 1),
        "shape": {"B": B, "M": M, "N": N, "C": C, "L": L, "P": P, **solver_kw},
    }
    conf_ok = (
        abs(out["median_conf_fused"] - out["median_conf_dense"])
        <= 0.05 * max(out["median_conf_dense"], 1e-9)
    )
    gate = (
        out["median_rot_delta_route_deg"] <= 1.5 * out["median_rot_delta_noise_deg"]
        and out["median_t_delta_route_m"] <= 1.5 * out["median_t_delta_noise_m"]
        and conf_ok
        and out["valid_fused"] == out["valid_dense"]
    )
    out["gate_passed"] = bool(gate)
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    if not gate:
        sys.exit(1)


if __name__ == "__main__":
    main()
