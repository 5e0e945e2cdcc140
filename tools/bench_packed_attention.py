"""Same-process A/B: packed head-major attention kernel vs the classic
(B,S,H,D)-relayout path, inside the full ViT-L backbone on the chip.

Checks numerics (fp32 fmap max-abs diff on a row slice) and timing with
scalar-fetch sync and varied inputs.

Usage: python tools/bench_packed_attention.py [--iters 5]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--batch", type=int, default=16)  # images (= 8 pairs)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from mickey_tpu.config import default_config
    from mickey_tpu.nn.extractor import backbone_features, extractor_init
    from mickey_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = default_config()
    params = extractor_init(jax.random.PRNGKey(0), cfg)
    B, H, W = args.batch, 714, 532
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))

    variants = []
    for name, packed in (("classic", False), ("packed", True)):
        c = cfg.clone()
        c.TPU.PACKED_ATTENTION = packed
        f = jax.jit(lambda p, im, eps, c=c: jnp.sum(backbone_features(p, im * (1 + eps), c)))
        g = jax.jit(lambda p, im, c=c: backbone_features(p, im, c)[:1, :2])  # tiny slice fetch
        variants.append((name, f, g))

    slices = {}
    for name, f, g in variants:
        v = float(f(params, images, jnp.float32(0)))
        slices[name] = np.asarray(jax.device_get(g(params, images)))
        t0 = time.perf_counter()
        for i in range(args.iters):
            v = float(f(params, images, jnp.float32(1e-9 * (i + 1))))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:8s} {dt*1e3:8.1f} ms/{B}-img  v={v:.1f}", flush=True)

    diff = np.abs(slices["classic"] - slices["packed"]).max()
    print(f"fmap slice max-abs diff: {diff:.3e}", flush=True)


if __name__ == "__main__":
    main()
