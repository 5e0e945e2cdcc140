"""Same-process A/B of flash-attention block sizes INSIDE the staged ViT-L
backbone program (VERDICT item 10).

Round 1 measured bq512/bk2048 ~1.7x faster than bq256/bk512 standalone, but
the monolithic pipeline containing it could not compile through the flaky
remote-compile service. The pipeline is now staged (the backbone compiles as
its own program, models/relative_pose.py), so the big blocks get a fair
retry: compile the backbone stage once per block config in one process and
time with scalar-fetch sync on varied inputs.

Usage: python tools/bench_backbone_blocks.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mickey_tpu.config import default_config
    from mickey_tpu.nn.extractor import backbone_features, model_init
    from mickey_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    B, H, W = 16, 714, 532  # 8 pairs stacked, benchmark resolution
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))

    cfg = default_config()
    params = model_init(jax.random.PRNGKey(0), cfg)

    # analytic forward FLOPs of ViT-L on 16 x 1939 tokens (params + attention)
    n_tok, dim, depth = 1939, 1024, 24
    flops = B * n_tok * (2 * 303e6) + depth * B * (4 * n_tok * n_tok * dim)

    # MXU ceiling calibration: the backbone's dominant matmul shapes, chained
    w1 = jnp.asarray(rng.normal(size=(1024, 4096)).astype(np.float32), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(4096, 1024)).astype(np.float32), jnp.bfloat16)
    xmm = jnp.asarray(rng.normal(size=(16 * 2048, 1024)).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def mm_chain(x, w1, w2, eps):
        def body(c, _):
            c = jax.lax.dot(c, w1, preferred_element_type=jnp.bfloat16)
            c = jax.lax.dot(c, w2, preferred_element_type=jnp.bfloat16)
            return c * (1.0 / 64.0), None
        c, _ = jax.lax.scan(body, x + eps, None, length=24)
        return jnp.sum(c[::31, ::31].astype(jnp.float32))

    mm_flops = 24 * 2 * 2 * (16 * 2048) * 1024 * 4096
    v = float(mm_chain(xmm, w1, w2, jnp.bfloat16(0)))
    t0 = time.perf_counter()
    for i in range(8):
        v = float(mm_chain(xmm, w1, w2, jnp.bfloat16(1e-8 * (i + 1))))
    dtm = (time.perf_counter() - t0) / 8
    print(f"matmul ceiling (24x 32Kx1024x4096 pairs): {dtm*1e3:7.1f} ms  "
          f"{mm_flops/dtm/1e12:5.1f} TF/s", flush=True)

    results = {}
    for bq, bk, unroll in ((256, 512, 1), (512, 2048, 1), (512, 2048, 2), (512, 2048, 4)):
        c = default_config()
        c.TPU.ATTENTION_BLOCKS = [bq, bk]
        c.TPU.SCAN_UNROLL = unroll

        def f(params, images, eps, c=c):
            fmap = backbone_features(params, images + eps, c)
            return jnp.sum(fmap[:, ::7, ::7, ::31])

        jf = jax.jit(f)
        try:
            val = float(jf(params, images, jnp.float32(0.0)))  # compile+warm
        except Exception as e:
            print(f"bq{bq}/bk{bk}/u{unroll}: COMPILE FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        t0 = time.perf_counter()
        iters = 8
        for i in range(iters):
            val = float(jf(params, images, jnp.float32(1e-9 * (i + 1))))
        dt = (time.perf_counter() - t0) / iters
        results[(bq, bk, unroll)] = dt
        print(
            f"backbone bq{bq:4d}/bk{bk:4d} unroll{unroll}: {dt*1e3:7.1f} ms/batch-8  "
            f"{flops/dt/1e12:5.1f} TF/s  v={val:.2f}",
            flush=True,
        )

    if results:
        best = min(results, key=results.get)
        print(f"best: {best} at {results[best]*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
