"""Same-process A/B: bf16 vs int8-PTQ backbone through the FULL serving chain.

tools/bench_int8_backbone.py measured the backbone PASS at 1.105x under int8
PTQ; BASELINE.md then projected "~+9-10% on both headline layouts". This tool
replaces the projection with a measurement: both param trees (bf16 and
``vit_quantize_int8`` of the same weights) run the complete staged serving
pipeline — backbone -> heads -> fused matcher->top-K -> Procrustes RANSAC —
interleaved iteration-by-iteration in ONE process, on BOTH bench.py layouts:

  general:   both images extracted per pair (round-1/2 basis)
  benchmark: shared-keyframe Map-free layout (per-scene reference extract
             cached; only queries pay the backbone — bench.py's headline)

The staged programs dispatch on the param tree (nn/quant.maybe_linear), so
the int8 arm is exactly what a user enabling ``MICKEY.DINOV2.INT8`` serves
(models/relative_pose.py:52). Methodology per CLAUDE.md: the tunneled TPU
drifts across multi-minute service phases, so the statistic is the median of
per-adjacent-pair deltas; every timing is a scalar fetch of a jitted
scalar-returning program with per-iteration input variation.

Reference anchor: the reference's own precision lever is fp16 autocast of
the backbone (mickey_extractor.py:31-35).

Usage: python tools/ab_int8_e2e.py [--iters 10] [--batch 16] [--json OUT]
       (--cpu = tiny-shape smoke for CI; timings meaningless there)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10, help="paired iterations per layout")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=714)
    ap.add_argument("--width", type=int, default=532)
    ap.add_argument("--json", default="")
    ap.add_argument("--cpu", action="store_true", help="tiny-shape CPU smoke")
    args = ap.parse_args()

    import jax

    if args.cpu:  # the axon sitecustomize pins 'axon,cpu' (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from mickey_tpu.config import default_config
    from mickey_tpu.models import relative_pose as rp
    from mickey_tpu.nn.extractor import model_init
    from mickey_tpu.nn.quant import vit_quantize_int8
    from mickey_tpu.solver.procrustes_ransac import (
        estimate_pose_from_cfg,
        estimate_pose_topk_from_cfg,
    )
    from mickey_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    B, H, W = args.batch, args.height, args.width
    cfg = default_config()
    if args.cpu:
        B, H, W = 2, 126, 112
        cfg.MICKEY.DINOV2.VARIANT = "vit_small"
        cfg.MICKEY.DINOV2.CHANNEL_DIM = 384
        cfg.MICKEY.KP_HEADS.BLOCKS_DIM = [32, 16, 128, 8]
        cfg.MICKEY.DSC_HEAD.LAST_DIM = 16
        pc = cfg.PROCRUSTES
        pc.IT_MATCHES, pc.IT_RANSAC = 2, 4
        pc.NUM_SAMPLED_MATCHES, pc.NUM_CORR_3D_3D, pc.NUM_REFINEMENTS = 12, 3, 1
        cfg.TPU.SAMPLING_PREFILTER = 64

    params_bf16 = model_init(jax.random.PRNGKey(0), cfg)
    arms = {
        "bf16": params_bf16,
        "int8": dict(params_bf16, dinov2=vit_quantize_int8(params_bf16["dinov2"])),
    }

    cfg_id = id(cfg)
    rp._CFG_REGISTRY[cfg_id] = cfg
    use_topk = rp._use_fused_topk(cfg)
    solve = estimate_pose_topk_from_cfg if use_topk else estimate_pose_from_cfg
    match_feats = rp._match_feats_topk_jit if use_topk else rp._match_feats_jit

    rng = np.random.default_rng(0)
    im0 = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    im1 = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    K = np.zeros((B, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 550
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = W / 2, H / 2, 1
    K = jnp.asarray(K)
    key = jax.random.PRNGKey(0)

    def one_pass_general(params, key, eps):
        corr = rp._staged_correspondences(params, im0 + eps, im1, cfg_id, topk=use_topk)
        est = solve(key, corr, K, K, cfg)
        return jnp.sum(est.confidence)

    def extract(params, images):
        fmap = rp._backbone_jit(params, images, cfg_id)
        return rp._heads_jit(params, fmap, cfg_id)

    # per-arm cached reference-side extract outputs, re-concatenated per
    # iteration exactly as cli/submission.py's predict() gathers per pair
    ref_slices = {}

    def one_pass_shared(params, name, key, eps):
        ref_feats = tuple(
            jnp.concatenate([s[j] for s in ref_slices[name]], axis=0) for j in range(4)
        )
        q_feats = extract(params, im1 + eps)
        corr = match_feats(params, ref_feats, q_feats, cfg_id)
        est = solve(key, corr, K, K, cfg)
        return jnp.sum(est.confidence)

    # warm every (arm, layout) program with retry against the flaky
    # remote-compile service; each success persists in the compilation cache
    for name, params in arms.items():
        for attempt in range(6):
            try:
                t0 = time.perf_counter()
                v = float(one_pass_general(params, key, jnp.float32(0.0)))
                ref_full = extract(params, im0)
                ref_slices[name] = [
                    tuple(f[i : i + 1] for f in ref_full) for i in range(B)
                ]
                float(one_pass_shared(params, name, key, jnp.float32(0.0)))
                print(
                    f"warmup {name}: {time.perf_counter() - t0:.1f}s "
                    f"(general conf-sum {v:.3f})",
                    flush=True,
                )
                break
            except Exception as e:  # noqa: BLE001
                if attempt == 5:
                    raise
                print(
                    f"# warmup {name} attempt {attempt} failed "
                    f"({type(e).__name__}); retrying",
                    flush=True,
                )
                time.sleep(10)

    results = {}
    for layout, passfn in (
        ("general", lambda p, n, k, e: one_pass_general(p, k, e)),
        ("benchmark", one_pass_shared),
    ):
        times = {"bf16": [], "int8": []}
        for i in range(args.iters):
            it_key = jax.random.fold_in(key, i)
            eps = jnp.float32(1e-9 * (i + 1))
            for name in ("bf16", "int8"):
                t0 = time.perf_counter()
                v = float(passfn(arms[name], name, it_key, eps))
                times[name].append((time.perf_counter() - t0) * 1e3)
                assert np.isfinite(v)
            print(
                f"{layout} iter {i}: bf16 {times['bf16'][-1]:7.1f} ms  "
                f"int8 {times['int8'][-1]:7.1f} ms  "
                f"delta {times['bf16'][-1] - times['int8'][-1]:+6.1f} ms",
                flush=True,
            )
        deltas = [a - b for a, b in zip(times["bf16"], times["int8"])]
        med = lambda x: float(np.median(x))  # noqa: E731
        results[layout] = {
            "bf16_med_ms": round(med(times["bf16"]), 2),
            "int8_med_ms": round(med(times["int8"]), 2),
            "delta_med_ms": round(med(deltas), 2),
            "speedup": round(med(times["bf16"]) / med(times["int8"]), 4),
            "bf16_pairs_per_sec": round(B / (med(times["bf16"]) / 1e3), 2),
            "int8_pairs_per_sec": round(B / (med(times["int8"]) / 1e3), 2),
            "per_pair_delta_ms": [round(d, 1) for d in deltas],
            "positive_pairs": int(sum(d > 0 for d in deltas)),
        }

    out = {
        "metric": "int8_e2e_speedup_benchmark_layout",
        "value": results["benchmark"]["speedup"],
        "unit": "x",
        "batch": B,
        "iters": args.iters,
        "fused_topk": bool(use_topk),
        **{f"{k}_layout": v for k, v in results.items()},
    }
    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
