"""Per-stage timing of the staged inference pipeline (TPU, scalar-fetch sync).

Times the four separately-compiled programs exactly as production runs them
(models/relative_pose.py): backbone -> heads -> matcher -> solver, plus the
end-to-end chain. Each timed call returns one scalar fetched to the host;
inputs vary per iteration.

Usage: python tools/bench_staged.py [--iters 6] [--batch 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--height", type=int, default=714)
    parser.add_argument("--width", type=int, default=532)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from mickey_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from mickey_tpu.config import default_config
    from mickey_tpu.models import relative_pose as rp
    from mickey_tpu.nn.extractor import model_init
    from mickey_tpu.solver.procrustes_ransac import estimate_pose_from_cfg

    cfg = default_config()
    params = model_init(jax.random.PRNGKey(0), cfg)
    cfg_id = id(cfg)
    rp._CFG_REGISTRY[cfg_id] = cfg

    B, H, W = args.batch, args.height, args.width
    rng = np.random.default_rng(0)
    im0 = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    im1 = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    K = np.zeros((B, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 550
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = W / 2, H / 2, 1
    K = jnp.asarray(K)
    stacked = jnp.concatenate([im0, im1], axis=0)

    # warm every stage once (intermediates reused as inputs below)
    fmap = rp._backbone_jit(params, stacked, cfg_id)
    kpts, depths, scores, descs = rp._heads_jit(params, fmap, cfg_id)
    corr = rp._match_jit(params, kpts, depths, scores, descs, cfg_id)
    key = jax.random.PRNGKey(0)
    est = estimate_pose_from_cfg(key, corr, K, K, cfg)
    float(jnp.sum(est.confidence))

    def timeit(name, fn):
        v = float(fn(0))  # warm
        ts = []
        for i in range(args.iters):
            t0 = time.perf_counter()
            v = float(fn(i + 1))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))  # stall-phase robust (see bench.py note)
        print(
            f"{name:16s} {dt*1e3:8.1f} ms/batch-{B} (mean {1e3*np.mean(ts):7.1f})"
            f"  v={v:.2f}",
            flush=True,
        )
        return dt

    @jax.jit
    def bsum(x):
        return jnp.sum(x[:, ::7, ::7, ::31])

    t_bb = timeit("backbone", lambda i: bsum(
        rp._backbone_jit(params, stacked + jnp.float32(1e-9 * i), cfg_id)))

    @jax.jit
    def hsum(s):
        return jnp.sum(s)

    def heads_fn(i):
        k, d, s, c = rp._heads_jit(params, fmap + jnp.float32(1e-9 * i), cfg_id)
        return hsum(s)

    t_h = timeit("heads", heads_fn)

    def match_fn(i):
        c = rp._match_jit(
            params, kpts, depths, scores, descs + jnp.float32(1e-9 * i) * descs, cfg_id
        )
        return hsum(c.scores[..., 0])

    t_m = timeit("matcher", match_fn)

    # same-process A/B of bf16 conv compute in the heads (round 3)
    import copy

    cfg_hab = copy.deepcopy(cfg)
    cfg_hab.TPU.HEADS_BF16 = not bool(cfg.TPU.get("HEADS_BF16", True))
    rp._CFG_REGISTRY[id(cfg_hab)] = cfg_hab
    hvariant = "on" if cfg_hab.TPU.HEADS_BF16 else "off"

    def heads_ab_fn(i):
        k, d, s, c = rp._heads_jit(params, fmap + jnp.float32(1e-9 * i), id(cfg_hab))
        return hsum(s)

    timeit(f"heads[bf16_{hvariant}]", heads_ab_fn)

    # same-process A/B of bf16 matcher descriptors (round 3, VERDICT item 9)
    cfg_mab = copy.deepcopy(cfg)
    cfg_mab.TPU.MATCHER_BF16 = not bool(cfg.TPU.get("MATCHER_BF16", False))
    rp._CFG_REGISTRY[id(cfg_mab)] = cfg_mab
    mvariant = "on" if cfg_mab.TPU.MATCHER_BF16 else "off"

    def match_ab_fn(i):
        c = rp._match_jit(
            params, kpts, depths, scores, descs + jnp.float32(1e-9 * i) * descs,
            id(cfg_mab),
        )
        return hsum(c.scores[..., 0])

    timeit(f"matcher[bf16_{mvariant}]", match_ab_fn)

    def solver_fn(i):
        e = estimate_pose_from_cfg(jax.random.fold_in(key, i), corr, K, K, cfg)
        return hsum(e.confidence)

    t_s = timeit("solver", solver_fn)

    # same-process A/B of the fused hypothesis-scoring kernel (round 3)
    cfg_noscore = copy.deepcopy(cfg)
    cfg_noscore.TPU.USE_PALLAS_SCORING = not bool(cfg.TPU.get("USE_PALLAS_SCORING", True))
    variant = "on" if cfg_noscore.TPU.USE_PALLAS_SCORING else "off"

    def solver_ab_fn(i):
        e = estimate_pose_from_cfg(jax.random.fold_in(key, i), corr, K, K, cfg_noscore)
        return hsum(e.confidence)

    timeit(f"solver[sc_{variant}]", solver_ab_fn)

    def full_fn(i):
        c = rp._staged_correspondences(params, im0 + jnp.float32(1e-9 * i), im1, cfg_id)
        e = estimate_pose_from_cfg(jax.random.fold_in(key, i), c, K, K, cfg)
        return hsum(e.confidence)

    t_f = timeit("full_chain", full_fn)
    print(
        f"sum(stages)={1e3*(t_bb+t_h+t_m+t_s):.1f} ms vs chain={1e3*t_f:.1f} ms "
        f"(gap ~= per-dispatch RTT)", flush=True,
    )


if __name__ == "__main__":
    main()
