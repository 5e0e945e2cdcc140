"""Cumulative prefix decomposition of the training-loss forward on the TPU.

Round 2's hand-reconstructed stages summed to ~63 ms while the monolithic
forward measured 130-160 ms — the reconstruction wasn't the real program.
This version times PREFIXES of the actual ``metric_pose_loss`` (via its
``_profile_stage`` hook), so consecutive differences decompose the monolith
exactly:

  sample       prefilter + outer Gumbel draws + gathers + backprojection
  inner_sample + inner minimal-set Gumbel draws + one-hot masks
  refine       + num_ref_steps x (masked Procrustes + inlier counting)
  score        + grad-carrying re-solve + soft inlier scores
  pose_loss    + per-hypothesis VCRE/pose losses
  full         + aggregation + curriculum mask + REINFORCE surrogate
  grad         jax.grad of full (the real train-step cost)

Usage: python tools/bench_loss_stages.py [--iters 5]
"""

import argparse
import functools
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
    from mickey_tpu.geometry.rotations import quat2mat
    from mickey_tpu.training.loss import LossConfig, metric_pose_loss
    from mickey_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = default_config()
    lc = LossConfig.from_cfg(cfg)
    B, N = args.batch, args.n
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
    topk = jnp.float32(80.0)

    @functools.partial(jax.jit, static_argnames=("stage",))
    def prefix(fs, key, eps, stage):
        total, _ = metric_pose_loss(
            fs * (1 + eps), kps, dep, kps, dep, K, K, K, K, T, tvec, key, lc, topk,
            _profile_stage=stage,
        )
        return total

    @jax.jit
    def grad_fs(fs, key, eps):
        def f(fs_in):
            total, _ = metric_pose_loss(
                fs_in, kps, dep, kps, dep, K, K, K, K, T, tvec, key, lc, topk
            )
            return total

        return jnp.sum(jnp.abs(jax.grad(f)(fs * (1 + eps))))

    key0 = jax.random.PRNGKey(0)
    order = ["sample", "inner_sample", "refine", "score", "pose_loss", None]
    times = {}
    for stage in order:
        name = stage or "full"
        fn = lambda i, stage=stage: float(
            prefix(fs, jax.random.fold_in(key0, i), jnp.float32(1e-9 * i), stage)
        )
        v = fn(0)  # compile
        t0 = time.perf_counter()
        for i in range(args.iters):
            v = fn(i + 1)
        dt = (time.perf_counter() - t0) / args.iters
        times[name] = dt
        print(f"{name:12s} {dt*1e3:8.1f} ms/batch-{B}  v={v:.3e}", flush=True)

    v = float(grad_fs(fs, key0, jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(args.iters):
        v = float(grad_fs(fs, jax.random.fold_in(key0, i), jnp.float32(1e-9 * i)))
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{'grad':12s} {dt*1e3:8.1f} ms/batch-{B}  v={v:.3e}", flush=True)

    print("\n== per-stage deltas (cumulative prefixes) ==", flush=True)
    prev = 0.0
    for name in ["sample", "inner_sample", "refine", "score", "pose_loss", "full"]:
        print(f"{name:12s} +{(times[name]-prev)*1e3:7.1f} ms", flush=True)
        prev = times[name]


if __name__ == "__main__":
    main()
