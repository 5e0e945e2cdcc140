"""Micro-benchmark: strategies for the solver's outer Gumbel draw
top_k((it*B, P) -> S) where S = P/2 (k=2048 of 4096).

lax.top_k with k in the thousands is known-pathological on TPU (CLAUDE.md);
at k = n/2 a full argsort-and-slice may win, and approx_max_k is the upper
bound. Usage: python tools/bench_topk.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import sys
    rows, n, k = 160, 4096, int(sys.argv[1]) if len(sys.argv) > 1 else 2048  # it_matches*B draws over the prefilter set
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(rows, n)).astype(np.float32))

    def timeit(name, fn):
        f = jax.jit(fn)
        v = float(f(x, jnp.float32(0)))
        t0 = time.perf_counter()
        for i in range(10):
            v = float(f(x, jnp.float32(1e-9 * (i + 1))))
        dt = (time.perf_counter() - t0) / 10
        print(f"{name:22s} {dt*1e3:8.2f} ms  v={v:.1f}", flush=True)

    def via_topk(x, eps):
        _, idx = jax.lax.top_k(x + eps, k)
        return jnp.sum(idx[:, ::97].astype(jnp.float32))

    def via_argsort(x, eps):
        idx = jnp.argsort(-(x + eps), axis=-1)[:, :k]
        return jnp.sum(idx[:, ::97].astype(jnp.float32))

    def via_sort_pair(x, eps):
        neg = -(x + eps)
        iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        _, idx = jax.lax.sort((neg, iota), dimension=-1, num_keys=1)
        return jnp.sum(idx[:, :k][:, ::97].astype(jnp.float32))

    def via_approx(x, eps):
        _, idx = jax.lax.approx_max_k(x + eps, k)
        return jnp.sum(idx[:, ::97].astype(jnp.float32))

    timeit("lax.top_k", via_topk)
    timeit("argsort_slice", via_argsort)
    timeit("lax.sort_pair", via_sort_pair)
    timeit("approx_max_k", via_approx)


if __name__ == "__main__":
    main()
