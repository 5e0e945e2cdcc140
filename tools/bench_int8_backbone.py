"""Same-process A/B: bf16 vs int8-PTQ DINOv2 backbone (VERDICT r4 #5a).

The round-5 stage decomposition (BENCHLOG) puts the benchmark-layout step at
~85% backbone running at ~90% of the chip's bf16 matmul calibration — the
one remaining single-chip throughput lever is precision. v5e's MXU runs
s8xs8->s32 at ~2x its bf16 rate, and the backbone is frozen at inference
(reference mickey_extractor.py:31-35: fp16 autocast + no_grad), so
weight-static / activation-dynamic int8 PTQ (nn/quant.py) is the candidate.

Methodology (CLAUDE.md): the tunneled TPU drifts across multi-minute service
phases, so both variants run interleaved in ONE process and the statistic is
the median of per-adjacent-pair deltas; every timing is a scalar fetch of a
jitted scalar-returning program with per-iteration input variation.

Quality readout (synthetic weights — real-checkpoint validation is blocked
on zero egress like tools/quality_run.py): per-token feature cosine between
the bf16 and int8 feature maps, plus through-the-heads drift of the
det-softmax score map and descriptor cosine, all computed on device in one
program (never fetch dense intermediates over the tunnel).

Usage: python tools/bench_int8_backbone.py [--iters 10] [--batch 16] [--json OUT]
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
    ap.add_argument("--iters", type=int, default=10, help="paired iterations")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=714)
    ap.add_argument("--width", type=int, default=532)
    ap.add_argument("--quality-batch", type=int, default=4)
    ap.add_argument("--json", default="")
    ap.add_argument("--cpu", action="store_true", help="CPU smoke (timings meaningless)")
    args = ap.parse_args()

    import jax

    if args.cpu:  # the axon sitecustomize pins 'axon,cpu' (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from mickey_tpu.config import default_config
    from mickey_tpu.nn.extractor import backbone_features, heads_apply, model_init
    from mickey_tpu.nn.quant import vit_quantize_int8
    from mickey_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    cfg = default_config()
    B, H, W = args.batch, args.height, args.width

    params = model_init(jax.random.PRNGKey(0), cfg)
    p_bf16 = params
    p_int8 = dict(params, dinov2=vit_quantize_int8(params["dinov2"]))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))

    @jax.jit
    def feat_sum(p, imgs, eps):
        fmap = backbone_features(p, imgs * (1.0 + eps), cfg)
        return jnp.sum(fmap.astype(jnp.float32))

    @jax.jit
    def quality(pa, pb, imgs):
        fa = backbone_features(pa, imgs, cfg)
        fb = backbone_features(pb, imgs, cfg)
        num = jnp.sum(fa * fb, -1)
        den = jnp.linalg.norm(fa, axis=-1) * jnp.linalg.norm(fb, axis=-1) + 1e-12
        cos = num / den
        (_, _, sa, da), _ = heads_apply(pa, fa, cfg, train=False)
        (_, _, sb, db), _ = heads_apply(pb, fb, cfg, train=False)
        dcos = jnp.sum(da * db, -1) / (
            jnp.linalg.norm(da, axis=-1) * jnp.linalg.norm(db, axis=-1) + 1e-12
        )
        return {
            "fmap_cos_mean": jnp.mean(cos),
            "fmap_cos_min": jnp.min(cos),
            "det_score_l1": jnp.mean(jnp.abs(sa - sb)),
            "det_score_max": jnp.max(jnp.abs(sa - sb)),
            "desc_cos_mean": jnp.mean(dcos),
        }

    arms = {"bf16": p_bf16, "int8": p_int8}
    for name, p in arms.items():  # warm with compile-retry (flaky service)
        for attempt in range(4):
            try:
                t0 = time.perf_counter()
                v = float(feat_sum(p, images, jnp.float32(0.0)))
                print(f"warmup {name}: {time.perf_counter()-t0:.1f}s (sum={v:.4g})", flush=True)
                break
            except Exception as e:  # noqa: BLE001
                if attempt == 3:
                    raise
                print(f"warmup {name} attempt {attempt} failed ({type(e).__name__}); retry", flush=True)
                time.sleep(10)

    times = {"bf16": [], "int8": []}
    for i in range(args.iters):
        eps = jnp.float32(1e-9 * (i + 1))
        for name in ("bf16", "int8"):
            t0 = time.perf_counter()
            v = float(feat_sum(arms[name], images, eps))
            times[name].append((time.perf_counter() - t0) * 1e3)
            assert np.isfinite(v)
        print(
            f"iter {i}: bf16 {times['bf16'][-1]:7.1f} ms  "
            f"int8 {times['int8'][-1]:7.1f} ms  "
            f"delta {times['bf16'][-1] - times['int8'][-1]:+7.1f} ms",
            flush=True,
        )

    qb = args.quality_batch
    q = jax.tree.map(float, quality(p_bf16, p_int8, images[:qb]))
    print("quality:", json.dumps(q), flush=True)

    deltas = [a - b for a, b in zip(times["bf16"], times["int8"])]
    out = {
        "metric": "backbone_bf16_minus_int8_ms",
        "value": round(float(np.median(deltas)), 2),
        "unit": f"ms/batch-{B}",
        "bf16_med_ms": round(float(np.median(times["bf16"])), 2),
        "int8_med_ms": round(float(np.median(times["int8"])), 2),
        "speedup": round(float(np.median(times["bf16"]) / np.median(times["int8"])), 3),
        "per_pair_delta_ms": [round(d, 1) for d in deltas],
        "quality": q,
    }
    print(json.dumps(out), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
