"""Flash-attention kernel variant sweep (TPU, scalar-fetch timing).

Usage: python tools/bench_attention.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mickey_tpu.ops.flash_attention import attention_reference, flash_attention

    B, H, S, D = 16, 16, 2048, 64  # batch-8 pairs = 16 images, ViT-L shape
    seq = 1939
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32), dtype=jnp.bfloat16)
    flops = 4 * B * H * S * S * D

    def timeit(name, fn):
        f = jax.jit(lambda q, k, v, eps: jnp.sum(fn(q + eps, k, v).astype(jnp.float32)))
        val = float(f(q, k, v, jnp.bfloat16(0)))
        t0 = time.perf_counter()
        for i in range(10):
            val = float(f(q, k, v, jnp.bfloat16(1e-8 * (i + 1))))
        dt = (time.perf_counter() - t0) / 10
        print(f"{name:28s} {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TF/s  v={val:.1f}", flush=True)

    timeit("xla_reference", lambda q, k, v: attention_reference(q, k, v, seq))
    for bq, bk in ((256, 512), (512, 512), (512, 1024), (512, 2048), (1024, 1024), (256, 2048)):
        timeit(
            f"pallas_bq{bq}_bk{bk}",
            lambda q, k, v, bq=bq, bk=bk: flash_attention(q, k, v, seq, block_q=bq, block_k=bk),
        )


if __name__ == "__main__":
    main()
