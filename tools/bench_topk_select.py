"""Micro-bench: final top-P selection strategies over the fused-topk
candidate table ((B, L*M_pad) = (16, 32768) -> P=4096).

The fused matcher->top-K route (ops/fused_matcher.py::fused_topk_scores)
ends with an exact top-P over the per-row candidates. _exact_topk_desc
routes k=4096, n=32768 to lax.top_k — which CLAUDE.md flags as pathological
for k >= ~1000. Candidates here: lax.top_k, full descending argsort+slice,
approx_max_k (inexact, recall target), and a two-stage
variant (approx_max_k to 2P then exact top-P over 2P).

Timing per CLAUDE.md: scalar-fetch sync, varied inputs, median-of-intervals.
Run ALONE.
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

    from mickey_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    B = int(os.environ.get("TOPK_BENCH_BATCH", 16))
    n = 16 * 2048  # row_topl * M_pad
    P = 4096
    ITERS = int(os.environ.get("TOPK_BENCH_ITERS", 20))

    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.uniform(0, 1, (B, n)).astype(np.float32))

    def make(fn):
        @jax.jit
        def f(x, eps):
            v, i = fn(x + eps)
            return jnp.sum(v) + jnp.sum(i % 7)

        return f

    def top_k(x):
        v, i = jax.lax.top_k(x, P)
        return v, i.astype(jnp.int32)

    def argsort(x):
        order = jnp.argsort(-x, axis=-1)[..., :P]
        return jnp.take_along_axis(x, order, axis=-1), order.astype(jnp.int32)

    def approx(x):
        v, i = jax.lax.approx_max_k(x, P, recall_target=0.95)
        return v, i.astype(jnp.int32)

    def approx2x_exact(x):
        v2, i2 = jax.lax.approx_max_k(x, 2 * P, recall_target=0.99)
        v, p = jax.lax.top_k(v2, P)
        return v, jnp.take_along_axis(i2, p, axis=-1).astype(jnp.int32)

    def bench(label, fn):
        f = make(fn)
        for a in range(4):
            try:
                float(f(base, jnp.float32(0.0)))
                break
            except Exception as e:
                if a == 3:
                    raise
                print(f"# warmup {label} attempt {a}: {type(e).__name__}; retry")
                time.sleep(10)
        iv = []
        for i in range(ITERS):
            t0 = time.perf_counter()
            v = float(f(base, jnp.float32(1e-9 * (i + 1))))
            assert np.isfinite(v)
            iv.append(time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "strategy": label,
                    "median_ms": round(float(np.median(iv)) * 1e3, 2),
                    "mean_ms": round(float(np.mean(iv)) * 1e3, 2),
                }
            ),
            flush=True,
        )

    bench("lax.top_k", top_k)
    bench("argsort_slice", argsort)
    bench("approx_max_k", approx)
    bench("approx2x_then_exact", approx2x_exact)


if __name__ == "__main__":
    main()
