"""Component-level TPU profiler with tunnel-safe timing.

The tunneled TPU backend acks dispatches asynchronously (block_until_ready
is unreliable), so every timed function returns ONLY a scalar which is
fetched to the host each iteration — a true sync point. Inputs vary per
iteration to defeat caching.

Usage: python tools/profile_components.py [--iters 5] [--batch 8] [--prefilter N]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, n_iters, results):
    import jax

    key = jax.random.PRNGKey(0)
    for attempt in range(5):  # remote-compile service drops long requests
        try:
            v = float(fn(key, 0))  # compile + warmup
            break
        except Exception as e:
            if attempt == 4:
                raise
            print(f"# {name} warmup attempt {attempt} failed ({type(e).__name__}); retrying", flush=True)
            time.sleep(10)
    t0 = time.perf_counter()
    for i in range(n_iters):
        v = float(fn(jax.random.fold_in(key, i), i + 1))
    dt = (time.perf_counter() - t0) / n_iters
    assert np.isfinite(v), (name, v)
    results[name] = dt
    print(f"{name:24s} {dt*1e3:9.2f} ms", flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--height", type=int, default=714)
    parser.add_argument("--width", type=int, default=532)
    parser.add_argument("--prefilter", type=int, default=None)
    parser.add_argument(
        "--only", default="", help="comma-separated subset: backbone,extractor,matcher,trunk,solver,full"
    )
    args = parser.parse_args()
    only = set(args.only.split(",")) if args.only else None

    import jax
    import jax.numpy as jnp

    from mickey_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from mickey_tpu.config import default_config
    from mickey_tpu.nn.dinov2 import vit_features_chw
    from mickey_tpu.nn.extractor import compute_correspondences, extract_features, model_init
    from mickey_tpu.nn.matcher import match_scores
    from mickey_tpu.solver.procrustes_ransac import estimate_pose_from_cfg

    cfg = default_config()
    if args.prefilter is not None:
        cfg.TPU.SAMPLING_PREFILTER = args.prefilter
    params = model_init(jax.random.PRNGKey(0), cfg)

    B, H, W = args.batch, args.height, args.width
    n = (H // 14) * (W // 14)
    rng = np.random.default_rng(0)
    im0 = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    im1 = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    K = np.zeros((B, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 550
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = W / 2, H / 2, 1
    K = jnp.asarray(K)
    stacked = jnp.concatenate([im0, im1], axis=0)

    print(f"== batch {B} pairs, {H}x{W}, prefilter={cfg.TPU.SAMPLING_PREFILTER} ==", flush=True)
    results = {}

    def want(name):
        return only is None or name in only

    if want("backbone"):
        @jax.jit
        def backbone(key, i):
            f = vit_features_chw(params["dinov2"], stacked + 1e-9 * i, use_pallas=True)
            return jnp.sum(f[..., 0])

        timeit("backbone_2B_images", backbone, args.iters, results)

    if want("extractor"):
        @jax.jit
        def extractor(key, i):
            (kpts, depths, scores, descs), _ = extract_features(params, stacked + 1e-9 * i, cfg)
            return jnp.sum(scores)

        timeit("extractor_2B_images", extractor, args.iters, results)

    if want("matcher"):
        dsc0 = jnp.asarray(rng.normal(size=(B, n, 128)).astype(np.float32))
        dsc1 = jnp.asarray(rng.normal(size=(B, n, 128)).astype(np.float32))

        @jax.jit
        def matcher(key, i):
            return jnp.sum(match_scores(params["matcher"], dsc0 + 1e-9 * i, dsc1, cfg)[..., 0])

        timeit("matcher", matcher, args.iters, results)

    if want("trunk"):
        @jax.jit
        def trunk(key, i):
            corr, _ = compute_correspondences(params, im0 + 1e-9 * i, im1, cfg)
            return jnp.sum(corr.scores[..., 0])

        timeit("trunk", trunk, args.iters, results)

    if want("solver"):
        fs = np.full((B, n, n), 1e-9, np.float32)
        diag = np.arange(n)
        fs[:, diag, diag] = 1.0
        fs = jnp.asarray(fs)
        kps = jnp.asarray(rng.uniform(0, 500, (B, n, 2)).astype(np.float32))
        dep = jnp.asarray(rng.uniform(1, 5, (B, n, 1)).astype(np.float32))

        class FakeCorr:
            pass

        @jax.jit
        def solver(key, i):
            corr = FakeCorr()
            corr.kps0 = corr.kps1 = kps
            corr.depth0 = corr.depth1 = dep
            corr.final_scores = fs * (1.0 + 1e-9 * i)
            est = estimate_pose_from_cfg(key, corr, K, K, cfg)
            return jnp.sum(est.confidence)

        timeit("solver", solver, args.iters, results)

    if want("full"):
        @jax.jit
        def full(key, i):
            corr, _ = compute_correspondences(params, im0 + 1e-9 * i, im1, cfg)
            est = estimate_pose_from_cfg(key, corr, K, K, cfg)
            return jnp.sum(est.confidence)

        timeit("full_pipeline", full, args.iters, results)

    print("== summary ==")
    for k, v in results.items():
        print(f"{k:24s} {v*1e3:9.2f} ms   ({B / v:7.2f} pairs/s)")


if __name__ == "__main__":
    main()
