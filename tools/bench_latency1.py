"""Single-pair serving latency: staged pipeline vs one fused program.

The production inference path runs as 5 separately-compiled programs
(backbone -> heads -> matcher -> solver stages, models/relative_pose.py) —
a compile-service survival choice that costs ~5 dispatch RTTs per call,
acceptable for throughput serving but ~110 ms on-tunnel for a single pair
(round-3 VERDICT weak #7). This probe A/Bs that against ONE jitted program
containing the whole batch-1 pipeline on the fused top-K route (smallest
possible program: no dense match matrices, B=1).

The fused program trades dispatch RTTs for one long compile; the persistent
compilation cache (utils/cache.py) makes the compile a one-time cost. If the
remote compile service drops the request (multi-minute ViT-L compiles break
its pipe — see relative_pose.py note), the probe retries, then reports the
staged numbers alone.

Timing per CLAUDE.md: scalar fetch of a scalar-returning jitted fn, varied
inputs, median of per-iteration intervals. Run ALONE.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mickey_tpu.config import default_config
    from mickey_tpu.nn.extractor import model_init
    from mickey_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = default_config()
    if os.environ.get("LAT_BENCH_SMALL") == "1":  # CPU smoke of the harness
        jax.config.update("jax_platforms", "cpu")
        cfg.MICKEY.DINOV2.VARIANT = "vit_small"
        cfg.MICKEY.DINOV2.CHANNEL_DIM = 384
        cfg.MICKEY.DINOV2.FLOAT16 = False
        cfg.MICKEY.KP_HEADS.BLOCKS_DIM = [32, 16, 128, 8]
        cfg.MICKEY.DSC_HEAD.LAST_DIM = 16
        cfg.DATASET.WIDTH, cfg.DATASET.HEIGHT = 112, 126
        cfg.TPU.SAMPLING_PREFILTER = 64
        cfg.TPU.PALLAS_INTERPRET = True
        pcs = cfg.PROCRUSTES
        pcs.IT_MATCHES, pcs.IT_RANSAC = 2, 4
        pcs.NUM_SAMPLED_MATCHES, pcs.NUM_CORR_3D_3D, pcs.NUM_REFINEMENTS = 12, 3, 1
    assert cfg.TPU.FUSED_TOPK and int(cfg.TPU.SAMPLING_PREFILTER) > 0
    params = model_init(jax.random.PRNGKey(0), cfg)

    H, W = 714, 532  # 540x720 cropped to /14 multiples (bench.py basis)
    if os.environ.get("LAT_BENCH_SMALL") == "1":
        H, W = cfg.DATASET.HEIGHT, cfg.DATASET.WIDTH
    rng = np.random.default_rng(0)
    im0 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    im1 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    K = np.zeros((1, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 590.0
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = W / 2, H / 2, 1
    Kj = jnp.asarray(K)
    key = jax.random.PRNGKey(1)
    ITERS = int(os.environ.get("LAT_BENCH_ITERS", 30))

    import mickey_tpu.models.relative_pose as rp

    cfg_id = id(cfg)
    rp._CFG_REGISTRY[cfg_id] = cfg

    from mickey_tpu.solver.procrustes_ransac import estimate_pose_topk_from_cfg

    # -- staged route (production): 5 dispatches per call -------------------
    def staged_pass(eps):
        tcorr = rp._staged_correspondences(params, im0 + eps, im1, cfg_id, topk=True)
        est = estimate_pose_topk_from_cfg(key, tcorr, Kj, Kj, cfg)
        return float(jnp.sum(est.confidence) + jnp.sum(est.R))

    # -- fused route: the whole batch-1 pipeline in ONE program -------------
    from mickey_tpu.nn.extractor import (
        absolute_kpt_coordinates,
        backbone_features,
        heads_apply,
        topk_correspondences_from_heads,
    )

    @jax.jit
    def fused_one(im0, im1, K0, K1, key):
        stacked = jnp.concatenate([im0, im1], axis=0)
        fmap = backbone_features(params, stacked, cfg)
        (kpts, depths, scores, descs), _ = heads_apply(params, fmap, cfg, train=False)
        kpts = absolute_kpt_coordinates(kpts, cfg.MICKEY.DINOV2.DOWN_FACTOR)
        tcorr = topk_correspondences_from_heads(params, kpts, depths, scores, descs, cfg)
        est = estimate_pose_topk_from_cfg(key, tcorr, K0, K1, cfg)
        return jnp.sum(est.confidence) + jnp.sum(est.R)

    def fused_pass(eps):
        return float(fused_one(im0 + eps, im1, Kj, Kj, key))

    def measure(label, fn, warm_attempts=4):
        for a in range(warm_attempts):
            try:
                t0 = time.perf_counter()
                fn(jnp.float32(0.0))
                compile_s = time.perf_counter() - t0
                break
            except Exception as e:
                if a == warm_attempts - 1:
                    print(f"# {label}: compile failed: {type(e).__name__}: {e}", flush=True)
                    return None
                print(f"# warmup {label} attempt {a}: {type(e).__name__}; retry", flush=True)
                time.sleep(20)
        iv = []
        for i in range(ITERS):
            t0 = time.perf_counter()
            v = fn(jnp.float32(1e-9 * (i + 1)))
            assert np.isfinite(v), label
            iv.append(time.perf_counter() - t0)
        out = {
            "route": label,
            "median_ms": round(float(np.median(iv)) * 1e3, 1),
            "mean_ms": round(float(np.mean(iv)) * 1e3, 1),
            "warm_s": round(compile_s, 1),
        }
        print(json.dumps(out), flush=True)
        return out

    s = measure("staged_batch1", staged_pass)
    f = measure("fused_batch1", fused_pass)
    if s and f:
        print(json.dumps({
            "speedup": round(s["median_ms"] / f["median_ms"], 2),
            "verdict": "fuse" if f["median_ms"] < s["median_ms"] else "keep staged",
        }), flush=True)


if __name__ == "__main__":
    main()
