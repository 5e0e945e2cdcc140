"""Stage decomposition of the fused matcher->top-K route, measured on-chip.

Each variant is wrapped in an in-program lax.scan over INNER iterations with
a per-iteration input perturbation and a scalar reduction, so the ~34 ms
tunnel dispatch RTT (measured by tools/bench_topk_select.py — all four
host-level selection strategies read identically at the RTT floor) is
amortized to RTT/INNER and per-iteration differences between variants are
real device time.

Variants (production operating point B=16, M=N=1938, C=128, L=16, P=4096):
  dense_route   fused_dual_softmax -> scr outer -> approx_max_k  (round-3)
  fused_exact   fused_topk_scores select="exact"                 (round-4)
  fused_approx  fused_topk_scores select="approx"
  cand_only     kernel stage only (no final top-P)
  cand_topl8    kernel stage with row_topl=8
  topk_only     lax.top_k(32768 -> 4096) on a fixed candidate table
  approx_only   approx_max_k(32768 -> 4096) on the same table

Timing per CLAUDE.md: scalar fetch, varied inputs, median of intervals.
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

    from mickey_tpu.ops.fused_matcher import (
        _topk_candidates,
        dense_topk_scores,
        fused_dual_softmax,
        fused_topk_scores,
    )
    from mickey_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    B, M, N, C = 16, 1938, 1938, 128
    L, P = 16, 4096
    INNER = int(os.environ.get("STAGE_BENCH_INNER", 8))
    ITERS = int(os.environ.get("STAGE_BENCH_ITERS", 10))
    T = 0.1

    rng = np.random.default_rng(0)
    d0 = rng.normal(size=(B, M, C)).astype(np.float32)
    d0 /= np.linalg.norm(d0, axis=-1, keepdims=True)
    d1 = rng.normal(size=(B, N, C)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    s0 = rng.uniform(0.1, 1.0, (B, M)).astype(np.float32)
    s1 = rng.uniform(0.1, 1.0, (B, N)).astype(np.float32)
    cand = rng.uniform(0.0, 1.0, (B, 32768)).astype(np.float32)
    d0j, d1j, s0j, s1j = map(jnp.asarray, (d0, d1, s0, s1))
    candj = jnp.asarray(cand)
    dustbin = jnp.float32(0.3)

    def scanned(body):
        @jax.jit
        def f(eps0):
            def step(acc, i):
                return acc + body(eps0 * (i + 1).astype(jnp.float32)), None

            out, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(INNER))
            return out

        return f

    def body_dense(eps):
        out = fused_dual_softmax(d0j + eps, d1j, dustbin, temperature=T)
        final = out * s0j[:, :, None] * s1j[:, None, :]
        v, i = jax.lax.approx_max_k(final.reshape(B, -1), P, recall_target=0.95)
        return jnp.sum(v) + jnp.sum(i % 7).astype(jnp.float32)

    def body_fused(select):
        def body(eps):
            v, i, ok = fused_topk_scores(
                d0j + eps, d1j, s0j, s1j, dustbin, P,
                temperature=T, row_topl=L, select=select,
            )
            return jnp.sum(v) + jnp.sum(i % 7).astype(jnp.float32) + jnp.sum(ok)

        return body

    def body_cand(topl):
        def body(eps):
            cv, ci, ok, _, _ = _topk_candidates(
                d0j + eps, d1j, s0j, s1j, dustbin, T, True, topl, 256, False
            )
            return jnp.sum(cv) + jnp.sum(ci % 7).astype(jnp.float32) + jnp.sum(ok)

        return body

    def body_topk(eps):
        v, i = jax.lax.top_k(candj + eps, P)
        return jnp.sum(v) + jnp.sum(i % 7).astype(jnp.float32)

    def body_approx(eps):
        v, i = jax.lax.approx_max_k(candj + eps, P, recall_target=0.95)
        return jnp.sum(v) + jnp.sum(i % 7).astype(jnp.float32)

    variants = [
        ("dense_route", body_dense),
        ("fused_exact", body_fused("exact")),
        ("fused_approx", body_fused("approx")),
        ("cand_only", body_cand(L)),
        ("cand_topl8", body_cand(8)),
        ("topk_only", body_topk),
        ("approx_only", body_approx),
    ]

    for label, body in variants:
        f = scanned(body)
        for a in range(4):
            try:
                float(f(jnp.float32(0.0)))
                break
            except Exception as e:
                if a == 3:
                    raise
                print(f"# warmup {label} attempt {a}: {type(e).__name__}; retry", flush=True)
                time.sleep(10)
        iv = []
        for i in range(ITERS):
            t0 = time.perf_counter()
            v = float(f(jnp.float32(1e-9 * (i + 1))))
            assert np.isfinite(v), label
            iv.append(time.perf_counter() - t0)
        med = float(np.median(iv))
        print(
            json.dumps(
                {
                    "stage": label,
                    "per_iter_ms": round(med / INNER * 1e3, 2),
                    "median_call_ms": round(med * 1e3, 2),
                    "mean_call_ms": round(float(np.mean(iv)) * 1e3, 2),
                    "inner": INNER,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
