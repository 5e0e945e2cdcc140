"""Production-shape statistical gate: dense route vs fused matcher->top-K.

VERDICT r4 #4: the fused route's bitwise/recall gates run at toy shapes in
interpret mode (tests/test_fused_matcher.py) and the e2e route parity is CPU;
this tool compares the POSE and CONFIDENCE DISTRIBUTIONS the two routes
produce at the real production shape on the real chip:

  N0 = N1 = 1938 (51x38 patch grid at 540x720), C = 128, P = 4096, L = 16,
  PROCRUSTES budget 20 x 100 x 2048, ~64 synthetic pairs.

The reference's sampling distribution being approximated is
probabilisticProcrustes.py:230-241 (torch.multinomial over the dense final
-score matrix). Our two TPU implementations of it:

  dense: dual_softmax -> (B, N0, N1) fp32 matrix -> * kp-score outer product
         -> approx_max_k(P, recall 0.95) prefilter -> Gumbel sampling
  fused: fused_topk_scores (streaming Pallas kernel, exact per-row top-L +
         exact top-P selection; the dense matrix never reaches HBM)
         -> estimate_pose_topk (same Gumbel sampling)

Neither is bitwise the other (the DENSE route is the one with an approximate
selection; the fused kernel's approximation is the per-row L-truncation), so
the gate is distributional: per-pair paired deltas on identical inputs +
identical PRNG keys, plus distribution-level medians.

Scenes are synthetic two-view problems with planted geometry (the
tests/test_ransac.py::make_scene recipe scaled to production N): ~50%% true
correspondences expressed through NOISY DESCRIPTORS (cosine ~0.94 at the
planted pairs), so the dual-softmax itself — not a hand-written score matrix
— produces the peaked sampling distribution both routes reduce.

Gates (asserted unless --report-only):
  - route validity identical per pair
  - median rotation / translation error of each route under the planted
    pose: |fused - dense| <= max(0.05 deg / 5 mm, 25%% of dense)
  - median relative confidence delta <= 10%% (confidence = soft-inlier count
    of a stochastic solver; paired keys keep most draws common)

Usage:  python tools/fused_route_gate.py [--pairs 64] [--batch 8] [--cpu]
        (--cpu = tiny-shape interpret-mode smoke for CI; chip run is the gate)
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_pair_batch(rng, B, N, C, inlier_frac=0.5, desc_noise=0.35, depth_noise=0.02):
    """Planted-geometry batch at descriptor level (see module docstring)."""
    K = np.zeros((B, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 600.0
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = 270.0, 360.0, 1.0

    # modest planted pose: 5-30 deg rotation, |t| ~ 0.5 m (keeps depths positive)
    Rs, ts = [], []
    for _ in range(B):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = np.radians(rng.uniform(5.0, 30.0))
        Kx = np.array(
            [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
        )
        Rs.append(np.eye(3) + math.sin(ang) * Kx + (1 - math.cos(ang)) * (Kx @ Kx))
        t = rng.normal(size=3)
        ts.append(0.5 * t / np.linalg.norm(t))
    R_gt = np.stack(Rs).astype(np.float32)
    t_gt = np.stack(ts).astype(np.float32).reshape(B, 1, 3)

    kps0 = rng.uniform(30, 510, (B, N, 2)).astype(np.float32)
    kps0[..., 1] *= 700.0 / 510.0  # spread over the 540x720 frame
    d0 = rng.uniform(2.0, 8.0, (B, N, 1)).astype(np.float32)

    # backproject -> transform -> project (numpy mirror of geometry.backproject_3d)
    ones = np.ones_like(d0)
    uv1h = np.concatenate([kps0, ones], axis=-1) * d0
    X = np.einsum("bij,bnj->bni", np.linalg.inv(K), uv1h)
    Y = np.einsum("bij,bnj->bni", R_gt, X) + t_gt
    uv = np.einsum("bij,bnj->bni", K, Y)
    kps1_true = (uv[..., :2] / uv[..., 2:3]).astype(np.float32)
    d1_true = uv[..., 2:3].astype(np.float32)

    n_in = int(N * inlier_frac)
    perm = np.stack([rng.permutation(N) for _ in range(B)])  # image-1 slot of point i

    kps1 = rng.uniform(30, 510, (B, N, 2)).astype(np.float32)
    kps1[..., 1] *= 700.0 / 510.0
    d1 = rng.uniform(2.0, 8.0, (B, N, 1)).astype(np.float32)

    dsc1 = rng.normal(size=(B, N, C)).astype(np.float32)
    dsc1 /= np.linalg.norm(dsc1, axis=-1, keepdims=True)
    dsc0 = rng.normal(size=(B, N, C)).astype(np.float32)

    for b in range(B):
        sl = perm[b, :n_in]
        kps1[b, sl] = kps1_true[b, :n_in]
        d1[b, sl] = d1_true[b, :n_in] + rng.normal(size=(n_in, 1)).astype(np.float32) * depth_noise
        dsc0[b, :n_in] = dsc1[b, sl] + rng.normal(size=(n_in, C)).astype(np.float32) * desc_noise
    dsc0 /= np.linalg.norm(dsc0, axis=-1, keepdims=True)

    scr0 = rng.uniform(0.2, 1.0, (B, N, 1)).astype(np.float32)
    scr1 = rng.uniform(0.2, 1.0, (B, N, 1)).astype(np.float32)

    T_gt = np.zeros((B, 4, 4), np.float32)
    T_gt[:, :3, :3] = R_gt
    T_gt[:, :3, 3] = t_gt[:, 0]
    T_gt[:, 3, 3] = 1.0
    return dict(
        kps0=kps0, depth0=d0, kps1=kps1, depth1=d1,
        dsc0=dsc0, dsc1=dsc1, scr0=scr0, scr1=scr1, K=K,
    ), T_gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=1938)
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--report-only", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="tiny-shape interpret-mode smoke (N=96, P=64, budget cut)")
    ap.add_argument("--json", default="", help="write the stats dict to this path")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from mickey_tpu.config import default_config
    from mickey_tpu.metrics.pose_metrics import pose_error
    from mickey_tpu.nn.matcher import dual_softmax, matcher_init
    from mickey_tpu.ops.fused_matcher import fused_topk_scores
    from mickey_tpu.solver.procrustes_ransac import estimate_pose, estimate_pose_topk
    from mickey_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = default_config()
    fm = cfg.FEATURE_MATCHER.DUAL_SOFTMAX
    pc = cfg.PROCRUSTES
    N, C = args.n, args.c
    P = int(cfg.TPU.SAMPLING_PREFILTER)
    L = int(cfg.TPU.MATCHER_TOPL)
    solver_kw = dict(
        it_matches=pc.IT_MATCHES, it_ransac=pc.IT_RANSAC,
        num_samples=pc.NUM_SAMPLED_MATCHES, num_corr=pc.NUM_CORR_3D_3D,
        num_refinements=pc.NUM_REFINEMENTS, th_inlier=pc.TH_INLIER,
        th_soft_inlier=pc.TH_SOFT_INLIER,
    )
    interpret = False
    if args.cpu:
        N, P, L = 96, 64, 8
        solver_kw.update(it_matches=4, it_ransac=16, num_samples=32)
        interpret = True

    mp = matcher_init(cfg)
    dustbin = mp.get("dustbin_score", jnp.float32(0.0))
    temp = float(fm.TEMPERATURE)
    use_db = bool(fm.USE_DUSTBIN)

    @jax.jit
    def dense_route(key, d):
        scores = dual_softmax(mp, d["dsc0"], d["dsc1"], cfg)
        final = scores * d["scr0"] * jnp.swapaxes(d["scr1"], 1, 2)
        est = estimate_pose(
            key, final, d["kps0"], d["depth0"], d["kps1"], d["depth1"],
            d["K"], d["K"], prefilter=P, **solver_kw,
        )
        return est.R, est.t, est.confidence, est.valid

    @jax.jit
    def fused_route(key, d):
        ts_, ti, row_ok = fused_topk_scores(
            d["dsc0"], d["dsc1"], d["scr0"][..., 0], d["scr1"][..., 0],
            dustbin, P, temperature=temp, use_dustbin=use_db,
            row_topl=L, interpret=interpret,
        )
        est = estimate_pose_topk(
            key, ts_, ti, row_ok, d["kps0"], d["depth0"], d["kps1"],
            d["depth1"], d["K"], d["K"], n1=N,
            pallas_interpret=interpret, **solver_kw,
        )
        return est.R, est.t, est.confidence, est.valid

    rng = np.random.default_rng(args.seed)
    rows = {r: {k: [] for k in ("R_err", "t_err", "conf", "valid")}
            for r in ("dense", "fused")}
    n_batches = max(1, args.pairs // args.batch)
    for i in range(n_batches):
        d_np, T_gt = make_pair_batch(rng, args.batch, N, C)
        d = {k: jnp.asarray(v) for k, v in d_np.items()}
        key = jax.random.PRNGKey(1000 + i)
        t0 = time.perf_counter()
        for name, fn in (("dense", dense_route), ("fused", fused_route)):
            R, t, conf, valid = fn(key, d)
            err = pose_error(R, t, jnp.asarray(T_gt))
            rows[name]["R_err"].append(np.asarray(err["R_err"]))
            rows[name]["t_err"].append(np.asarray(err["t_err_euc"]))
            rows[name]["conf"].append(np.asarray(conf))
            rows[name]["valid"].append(np.asarray(valid))
        print(f"batch {i + 1}/{n_batches}  ({time.perf_counter() - t0:.1f}s)", flush=True)

    st = {}
    for name in ("dense", "fused"):
        r = {k: np.concatenate(v).ravel() for k, v in rows[name].items()}
        st[name] = dict(
            valid_frac=float(r["valid"].mean()),
            R_err_med=float(np.median(r["R_err"])),
            R_err_p90=float(np.quantile(r["R_err"], 0.9)),
            t_err_med=float(np.median(r["t_err"])),
            t_err_p90=float(np.quantile(r["t_err"], 0.9)),
            conf_med=float(np.median(r["conf"])),
        )
        st[name]["_raw"] = r
    dv, fv = st["dense"]["_raw"], st["fused"]["_raw"]
    both = (dv["valid"] > 0) & (fv["valid"] > 0)
    rel_conf = np.abs(fv["conf"][both] - dv["conf"][both]) / np.maximum(dv["conf"][both], 1e-9)
    paired = dict(
        valid_agree_frac=float((dv["valid"] == fv["valid"]).mean()),
        dR_err_med=float(np.median(np.abs(fv["R_err"][both] - dv["R_err"][both]))),
        dt_err_med=float(np.median(np.abs(fv["t_err"][both] - dv["t_err"][both]))),
        rel_conf_delta_med=float(np.median(rel_conf)),
        conf_corr=float(np.corrcoef(dv["conf"][both], fv["conf"][both])[0, 1]),
        pairs=int(both.sum()),
    )
    for name in ("dense", "fused"):
        st[name].pop("_raw")
    out = dict(shape=dict(N=N, C=C, P=P, L=L, **solver_kw),
               dense=st["dense"], fused=st["fused"], paired=paired)
    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)

    if not args.report_only:
        d_, f_ = st["dense"], st["fused"]
        assert paired["valid_agree_frac"] == 1.0, paired
        tol_R = max(0.05, 0.25 * d_["R_err_med"])
        tol_t = max(0.005, 0.25 * d_["t_err_med"])
        assert abs(f_["R_err_med"] - d_["R_err_med"]) <= tol_R, (d_, f_)
        assert abs(f_["t_err_med"] - d_["t_err_med"]) <= tol_t, (d_, f_)
        assert paired["rel_conf_delta_med"] <= 0.10, paired
        print("GATE PASSED")


if __name__ == "__main__":
    main()
