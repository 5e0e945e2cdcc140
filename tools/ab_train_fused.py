"""Same-process A/B: dense vs fused-top-K TRAINING route step time.

The tunneled TPU has multi-minute service phases (CLAUDE.md: the same step
measured 606 ms mean in one phase, 390 ms in another) — cross-process A/Bs
of a ~1-2%% effect are meaningless. This tool builds BOTH train steps in one
process and interleaves them iteration-by-iteration, so every adjacent
(dense, fused) pair shares a phase; the reported statistic is the median of
per-adjacent-pair deltas.

Routes (training/train_step.py, gated by TPU.TRAIN_FUSED_TOPK):
  dense: fused_dual_softmax_vjp -> (B, N0, N1) match matrix * kp-score outer
         product -> metric_pose_loss samples from the dense matrix
  fused: fused_topk_scores_train -> top-P table + grad-carrying logsumexps;
         the dense matrix never exists in either direction
         (reference behavior being beaten: loss_class.py:136-159 trains
         through the dense matrix with hand-built sparse gradients)

Usage: python tools/ab_train_fused.py [--iters 12] [--batch 8]
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
    ap.add_argument("--iters", type=int, default=12, help="iterations per arm")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=714)
    ap.add_argument("--width", type=int, default=532)
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mickey_tpu.config import default_config
    from mickey_tpu.geometry.rotations import quat2mat
    from mickey_tpu.nn.extractor import model_init
    from mickey_tpu.training.train_step import init_train_state, make_train_step
    from mickey_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    B, H, W = args.batch, args.height, args.width
    cfg_dense = default_config()
    cfg_fused = default_config()
    cfg_fused.TPU.TRAIN_FUSED_TOPK = True

    params = model_init(jax.random.PRNGKey(0), cfg_dense)
    state, backbone = init_train_state(cfg_dense, params)
    steps = {"dense": make_train_step(cfg_dense), "fused": make_train_step(cfg_fused)}

    rng = np.random.default_rng(0)
    T = np.zeros((B, 4, 4), np.float32)
    for b in range(B):
        q = rng.normal(size=4)
        T[b, :3, :3] = quat2mat(q / np.linalg.norm(q))
        T[b, :3, 3] = rng.normal(size=3) * 0.3
        T[b, 3, 3] = 1
    K = np.zeros((B, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 550
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = W / 2, H / 2, 1
    batch = {
        "image0": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)),
        "image1": jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)),
        "T_0to1": jnp.asarray(T),
        "K_color0": jnp.asarray(K),
        "K_color1": jnp.asarray(K),
        "Kori_color0": jnp.asarray(K),
        "Kori_color1": jnp.asarray(K),
    }
    key = jax.random.PRNGKey(0)
    topk = jnp.float32(80.0)

    # warm both programs; each arm gets its OWN state copy up front because
    # the train step donates argnum 0 — feeding the shared `state` to the
    # first arm deletes its buffers before the second arm's warmup
    arms = {name: jax.tree.map(jnp.copy, state) for name in steps}
    for name, step in steps.items():
        t0 = time.perf_counter()
        arms[name], m = step(arms[name], backbone, batch, key, topk)
        loss = float(m["loss"])
        print(f"warmup {name}: {time.perf_counter() - t0:.1f}s loss={loss:.4f}", flush=True)

    times = {"dense": [], "fused": []}
    for i in range(args.iters):
        step_key = jax.random.fold_in(key, i)
        b2 = dict(batch, image0=batch["image0"] * (1.0 + 1e-9 * i))
        for name in ("dense", "fused"):
            t0 = time.perf_counter()
            arms[name], m = steps[name](arms[name], backbone, b2, step_key, topk)
            loss = float(m["loss"])  # scalar fetch = sync point
            times[name].append((time.perf_counter() - t0) * 1e3)
            assert np.isfinite(loss)
        print(
            f"iter {i}: dense {times['dense'][-1]:7.1f} ms  "
            f"fused {times['fused'][-1]:7.1f} ms  "
            f"delta {times['dense'][-1] - times['fused'][-1]:+6.1f} ms",
            flush=True,
        )

    deltas = [d - f for d, f in zip(times["dense"], times["fused"])]
    out = {
        "metric": "train_step_dense_minus_fused_ms",
        "value": round(float(np.median(deltas)), 2),
        "unit": "ms/step",
        "batch": B,
        "dense_med_ms": round(float(np.median(times["dense"])), 2),
        "fused_med_ms": round(float(np.median(times["fused"])), 2),
        "per_pair_delta_ms": [round(d, 1) for d in deltas],
    }
    print(json.dumps(out), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
