"""Training-loss forward/backward microbenchmark on random correspondences.

Isolates metric_pose_loss (differentiable RANSAC + REINFORCE surrogate) from
the trunk: random keypoints/depths/scores at the production operating point
(N=1938, budget 20x20x512, prefilter 4096), timed with scalar-fetch sync.

Usage: python tools/bench_loss.py [--iters 6] [--grad]
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
    parser.add_argument("--n", type=int, default=1938)
    parser.add_argument("--grad", action="store_true", help="time value_and_grad instead of forward")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from mickey_tpu.config import default_config
    from mickey_tpu.geometry.rotations import quat2mat
    from mickey_tpu.training.loss import LossConfig, metric_pose_loss
    from mickey_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = default_config()
    lc = LossConfig.from_cfg(cfg)
    B, N = args.batch, args.n
    rng = np.random.default_rng(0)

    fs = rng.uniform(0, 1, (B, N, N)).astype(np.float32) ** 8  # peaked scores
    kps = rng.uniform(0, 500, (B, N, 2)).astype(np.float32)
    dep = rng.uniform(1, 5, (B, N, 1)).astype(np.float32)
    K = np.zeros((B, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 550
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = 266, 357, 1
    T = np.zeros((B, 3, 3), np.float32)
    tvec = np.zeros((B, 1, 3), np.float32)
    for b in range(B):
        q = rng.normal(size=4)
        T[b] = quat2mat(q / np.linalg.norm(q))
        tvec[b, 0] = rng.normal(size=3) * 0.3

    fs, kps, dep, K, T, tvec = map(jnp.asarray, (fs, kps, dep, K, T, tvec))
    topk = jnp.float32(80.0)

    def loss_fn(fs, key):
        total, _ = metric_pose_loss(
            fs, kps, dep, kps, dep, K, K, K, K, T, tvec, key, lc, topk
        )
        return total

    if args.grad:
        f = jax.jit(lambda fs, key, eps: jax.value_and_grad(loss_fn)(fs * (1 + eps), key)[0])
        name = "loss fwd+bwd(fs)"
    else:
        f = jax.jit(lambda fs, key, eps: loss_fn(fs * (1 + eps), key))
        name = "loss forward"

    key = jax.random.PRNGKey(0)
    v = float(f(fs, key, jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(args.iters):
        v = float(f(fs, jax.random.fold_in(key, i), jnp.float32(1e-9 * (i + 1))))
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{name:18s} {dt*1e3:8.1f} ms/batch-{B}  v={v:.4f}", flush=True)


if __name__ == "__main__":
    main()
