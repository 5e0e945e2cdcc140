"""Grounding for BASELINE.md: reference solver vs ours on the SAME CPU.

The reference publishes no throughput numbers, so bench.py's `vs_baseline`
denominator needs evidence. This measures, at the production operating point
(N=1938 keypoints, 20x100x2048 budget):

  * the reference ``estimate_pose_vectorized`` (torch CPU,
    /root/reference/lib/.../probabilisticProcrustes.py:183-348),
  * its dominant primitive ``torch.multinomial`` in isolation,
  * our jitted solver (jax CPU, exact sampling AND production prefilter),

on identical inputs. The CPU-to-CPU ratio transfers to the A100-vs-TPU
comparison only directionally, but it pins down the solver-side overhead
structure that the round-1 estimate guessed at. See BASELINE.md.

Usage: python tools/bench_reference_solver.py [--batch 1] [--iters 3]
"""

import argparse
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--n_kpts", type=int, default=1938)
    parser.add_argument("--iters", type=int, default=3)
    args = parser.parse_args()

    import torch

    torch.manual_seed(0)

    # transforms3d stub so reference modules import (no such wheel here)
    import mickey_tpu.geometry.rotations as _rot

    t3d = types.ModuleType("transforms3d")
    t3dq = types.ModuleType("transforms3d.quaternions")
    for n in ("quat2mat", "mat2quat", "qinverse", "qmult", "rotate_vector"):
        setattr(t3dq, n, getattr(_rot, n))
    t3d.quaternions = t3dq
    sys.modules.setdefault("transforms3d", t3d)
    sys.modules.setdefault("transforms3d.quaternions", t3dq)
    sys.path.insert(0, "/root/reference")

    from lib.models.MicKey.modules.utils.probabilisticProcrustes import (
        e2eProbabilisticProcrustesSolver,
    )

    from mickey_tpu.config import default_config

    cfg = default_config()
    B, N = args.batch, args.n_kpts
    rng = np.random.default_rng(0)

    # peaked score matrix resembling a dual-softmax output
    fs = np.full((B, N, N), 1e-9, np.float32)
    fs[:, np.arange(N), np.arange(N)] = rng.uniform(0.2, 1.0, (B, N)).astype(np.float32)
    kps = rng.uniform(0, 500, (B, N, 2)).astype(np.float32)
    dep = rng.uniform(1, 5, (B, N, 1)).astype(np.float32)
    K = np.zeros((B, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 550
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = 266, 357, 1

    # -- reference (torch CPU) -------------------------------------------------
    solver = e2eProbabilisticProcrustesSolver(cfg)
    batch = {
        "final_scores": torch.from_numpy(fs),
        "kps0": torch.from_numpy(kps.transpose(0, 2, 1)),
        "depth_kp0": torch.from_numpy(dep.transpose(0, 2, 1)),
        "kps1": torch.from_numpy(kps.transpose(0, 2, 1)),
        "depth_kp1": torch.from_numpy(dep.transpose(0, 2, 1)),
        "K_color0": torch.from_numpy(K),
        "K_color1": torch.from_numpy(K),
    }

    with torch.no_grad():
        solver.estimate_pose_vectorized(batch)  # warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            R, t, inl = solver.estimate_pose_vectorized(batch)
        ref_dt = (time.perf_counter() - t0) / args.iters
    print(f"reference solver (torch CPU, B={B}): {ref_dt*1e3:9.1f} ms", flush=True)

    # the suspected dominator in isolation
    mrow = torch.from_numpy(np.tile(fs.reshape(B, N * N), (cfg.PROCRUSTES.IT_MATCHES, 1)))
    with torch.no_grad():
        torch.multinomial(mrow, cfg.PROCRUSTES.NUM_SAMPLED_MATCHES)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            torch.multinomial(mrow, cfg.PROCRUSTES.NUM_SAMPLED_MATCHES)
        mn_dt = (time.perf_counter() - t0) / args.iters
    print(
        f"torch.multinomial 20x(B={B}) of 2048 from {N*N/1e6:.1f}M: {mn_dt*1e3:9.1f} ms",
        flush=True,
    )

    # -- ours (jax CPU) ----------------------------------------------------------
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mickey_tpu.solver.procrustes_ransac import estimate_pose

    for label, prefilter in (("exact", 0), ("prefilter4096", 4096)):
        def run(key):
            est = estimate_pose(
                key, jnp.asarray(fs), jnp.asarray(kps), jnp.asarray(dep),
                jnp.asarray(kps), jnp.asarray(dep), jnp.asarray(K), jnp.asarray(K),
                prefilter=prefilter,
            )
            return est.confidence.sum()

        runj = jax.jit(run)
        key = jax.random.PRNGKey(0)
        float(runj(key))
        t0 = time.perf_counter()
        for i in range(args.iters):
            float(runj(jax.random.fold_in(key, i)))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"our solver (jax CPU, {label:14s} B={B}): {dt*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
