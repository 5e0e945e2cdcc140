"""Measure feature-cache streaming throughput (VERDICT r4 weak #7).

BASELINE.md's training-IO section states a BUDGET: cached-feature training
needs ~0.43 GB/s/chip (2x8 frames x ~4 MB bf16 per step at the cached-step
rate), ~3.5 GB/s for an 8-chip host, and asserts NVMe + page cache covers
it. This tool converts that stated budget into a HOST MEASUREMENT of the
actual read path (``training/feature_cache.FeatureCache.gather`` — memmap
fancy-indexed row gather, the exact call the cached train step makes per
batch, models/training_model.py).

Two regimes, both real:
  cold  — rows evicted from the page cache first (posix_fadvise DONTNEED on
          the cache file only; no system-wide cache drop), so gathers hit
          the block device. This is epoch 1 on a cold host.
  warm  — the steady-state training regime: the scene-balanced sampler
          re-draws the same unique frames every epoch, so after one epoch
          the working set (~4 GB/1000 frames) sits in the page cache and
          gathers are memcpy-bound.

The synthetic cache is built at the production feature shape
(Hp=51, Wp=38, C=1024 bf16 — the ViT-L /14 map of a 540x720 frame,
nn/extractor.py) so row size and stride match real training exactly.

Usage: python tools/bench_feature_cache_io.py [--frames 2048] [--steps 64]
       [--json out.json]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mickey_tpu.training.feature_cache import _DATA, _META, FeatureCache

FMAP_SHAPE = (51, 38, 1024)  # production ViT-L/14 feature map (540x720 input)


def build_synth_cache(root: str, n_frames: int) -> int:
    """Write a cache directory directly (no backbone): meta + memmap filled
    with deterministic non-constant data. Returns bytes per frame."""
    import ml_dtypes

    row_elems = int(np.prod(FMAP_SHAPE))
    mm = np.memmap(
        os.path.join(root, _DATA),
        dtype=np.dtype(ml_dtypes.bfloat16),
        mode="w+",
        shape=(n_frames, *FMAP_SHAPE),
    )
    # Fill with random bits in large chunks; gather never computes on the
    # values, and a non-constant page pattern defeats any fs shortcutting.
    rng = np.random.default_rng(0)
    raw = mm.reshape(n_frames, row_elems).view(np.uint16)
    chunk = 256
    for s in range(0, n_frames, chunk):
        e = min(s + chunk, n_frames)
        raw[s:e] = rng.integers(0, 1 << 16, (e - s, row_elems), dtype=np.uint16)
    mm.flush()
    meta = {
        "dtype": "bfloat16",
        "fmap_shape": list(FMAP_SHAPE),
        "keys": {f"frame{i:06d}": i for i in range(n_frames)},
        "fingerprint": {"param_sig": 0.0, "shape_sig": "synthetic", "n_leaves": 0},
    }
    with open(os.path.join(root, _META), "w") as f:
        json.dump(meta, f)
    return row_elems * 2  # bf16


def drop_file_cache(path: str) -> None:
    """Evict THIS file from the page cache (fadvise DONTNEED) — no
    system-wide state change."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
        os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
    finally:
        os.close(fd)


def run_epoch(cache: FeatureCache, steps: int, frames_per_step: int, seed: int):
    """Gather `steps` batches of random distinct rows (the sampler draws
    scene-balanced pairs; random rows model the worst stride pattern).
    Returns (total_bytes, per_step_seconds)."""
    rng = np.random.default_rng(seed)
    keys = list(cache.index)
    row_bytes = cache.dtype.itemsize * int(np.prod(cache.fmap_shape))
    per_step = []
    total = 0
    for _ in range(steps):
        batch = [keys[i] for i in rng.choice(len(keys), frames_per_step, False)]
        t0 = time.perf_counter()
        out = cache.gather(batch)
        # touch one element per 4 KB page so lazy reads actually happen
        _ = out.view(np.uint8)[:, :: 4096].sum()
        per_step.append(time.perf_counter() - t0)
        total += frames_per_step * row_bytes
    return total, per_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch-pairs", type=int, default=8, help="pairs/step -> 2x frames")
    ap.add_argument("--json", default="")
    args = ap.parse_args()
    frames_per_step = 2 * args.batch_pairs

    with tempfile.TemporaryDirectory(prefix="mickey_fcache_io_") as root:
        t0 = time.perf_counter()
        row_bytes = build_synth_cache(root, args.frames)
        build_s = time.perf_counter() - t0
        total_gb = args.frames * row_bytes / 1e9
        print(
            f"cache: {args.frames} frames x {row_bytes / 1e6:.2f} MB "
            f"= {total_gb:.1f} GB (built in {build_s:.1f}s)"
        )

        cache = FeatureCache(root)
        data_path = os.path.join(root, _DATA)

        drop_file_cache(data_path)
        cold_bytes, cold_steps = run_epoch(cache, args.steps, frames_per_step, 1)
        cold_gbps = cold_bytes / 1e9 / sum(cold_steps)

        # warm the full working set once (epoch 1 does this in training)
        warm_reader = np.fromfile(data_path, dtype=np.uint8, count=-1)
        del warm_reader
        warm_bytes, warm_steps = run_epoch(cache, args.steps, frames_per_step, 2)
        warm_gbps = warm_bytes / 1e9 / sum(warm_steps)

        budget_chip = 0.43  # GB/s/chip (BASELINE.md training-IO section)
        result = {
            "metric": "feature_cache_gather_gbps",
            "value": round(warm_gbps, 2),
            "unit": "GB/s",
            "cold_gbps": round(cold_gbps, 2),
            "warm_gbps": round(warm_gbps, 2),
            "frames": args.frames,
            "row_mb": round(row_bytes / 1e6, 2),
            "steps": args.steps,
            "frames_per_step": frames_per_step,
            "cold_step_ms_med": round(1e3 * float(np.median(cold_steps)), 2),
            "warm_step_ms_med": round(1e3 * float(np.median(warm_steps)), 2),
            "budget_gbps_per_chip": budget_chip,
            "chips_coverable_cold": round(cold_gbps / budget_chip, 1),
            "chips_coverable_warm": round(warm_gbps / budget_chip, 1),
        }
        print(json.dumps(result))
        if args.json:
            with open(args.json, "w") as f:
                json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
