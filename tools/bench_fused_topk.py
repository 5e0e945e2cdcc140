"""Micro-bench: fused matcher->top-K kernel vs the dense matcher + approx_max_k
prefilter, at the production operating point (B x 1938 x 1938 x 128, P=4096).

The dense route (round 3) writes the (B, N, N) fp32 final-score matrix
(~15 MB/pair) from the fused dual-softmax kernel, multiplies in the keypoint
-score outer product, then re-reads it with approx_max_k — ~2 full HBM round
-trips that exist only to feed the top-P sampling table
(solver/procrustes_ransac.py). The fused route (round 4) emits the per-row
top-L (value, index) candidates straight from VMEM (ops/fused_matcher.py::
fused_topk_scores) and exact-top-Ps the ~L*M candidates (~128 KB).

Timing per CLAUDE.md: scalar-fetch synchronization, varied inputs, median of
per-iteration intervals. Run ALONE (no concurrent CPU-heavy jobs).
"""

import functools
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mickey_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from mickey_tpu.ops.fused_matcher import fused_dual_softmax, fused_topk_scores

    B = int(os.environ.get("TOPK_BENCH_BATCH", 16))
    M = N = 1938
    C = 128
    P = 4096
    ITERS = int(os.environ.get("TOPK_BENCH_ITERS", 20))
    TOPL = int(os.environ.get("TOPK_BENCH_TOPL", 16))

    rng = np.random.default_rng(0)
    d0 = rng.standard_normal((B, M, C)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    d1 = rng.standard_normal((B, N, C)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    s0 = rng.uniform(0, 1, (B, M)).astype(np.float32)
    s1 = rng.uniform(0, 1, (B, N)).astype(np.float32)
    d0, d1, s0, s1 = map(jnp.asarray, (d0, d1, s0, s1))
    dustbin = jnp.float32(1.0)

    @jax.jit
    def dense_route(d0, d1, s0, s1, eps):
        """Round-3 path: dense fused matcher + score product + approx_max_k."""
        match = fused_dual_softmax(d0 + eps, d1, dustbin, temperature=0.1)
        final = match * s0[:, :, None] * s1[:, None, :]
        tv, ti = jax.lax.approx_max_k(final.reshape(B, M * N), P, recall_target=0.95)
        # same validity reductions the solver performs on the dense matrix
        flat = final.reshape(B, M * N)
        ok = (
            jnp.all(jnp.isfinite(flat), axis=-1)
            & jnp.all(flat >= 0, axis=-1)
            & (jnp.sum(flat, axis=-1) > 0)
        )
        return jnp.sum(tv) + jnp.sum(ti % 7) + jnp.sum(ok)

    @functools.partial(jax.jit, static_argnames=("topl",))
    def fused_route(d0, d1, s0, s1, eps, topl):
        tv, ti, ok = fused_topk_scores(
            d0 + eps, d1, s0, s1, dustbin, P, temperature=0.1, row_topl=topl
        )
        return jnp.sum(tv) + jnp.sum(ti % 7) + jnp.sum(ok)

    def bench(fn, label):
        for a in range(4):
            try:
                float(fn(d0, d1, s0, s1, jnp.float32(0.0)))
                break
            except Exception as e:
                if a == 3:
                    raise
                print(f"# warmup {label} attempt {a}: {type(e).__name__}; retry")
                time.sleep(10)
        iv = []
        for i in range(ITERS):
            t0 = time.perf_counter()
            v = float(fn(d0, d1, s0, s1, jnp.float32(1e-9 * (i + 1))))
            assert np.isfinite(v)
            iv.append(time.perf_counter() - t0)
        med = float(np.median(iv))
        print(
            json.dumps(
                {
                    "route": label,
                    "batch": B,
                    "median_ms": round(med * 1e3, 2),
                    "mean_ms": round(float(np.mean(iv)) * 1e3, 2),
                    "iter_ms": [round(t * 1e3, 1) for t in iv],
                }
            ),
            flush=True,
        )
        return med

    td = bench(dense_route, "dense+approx_max_k")
    tf = bench(functools.partial(fused_route, topl=TOPL), f"fused_topk_L{TOPL}")
    print(json.dumps({"speedup": round(td / tf, 3)}))


if __name__ == "__main__":
    main()
