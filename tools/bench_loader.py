"""Host data-loader throughput: native C++ batched ingest vs cv2-per-sample.

Synthesizes a Map-free-format val scene at the production operating point
(720x540 JPEGs resized to 540x720 (W x H) pairs, batch 8) and times full
loader epochs for both decode backends. The loader must outrun the compute
rate (BENCHLOG: ~15 pairs/s/chip inference) or it becomes the bottleneck.

Usage: python tools/bench_loader.py [--frames 120] [--batch 8]
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_scene(root, n_frames, src_wh=(540, 720)):
    import cv2

    from mickey_tpu.geometry.rotations import qnorm

    rng = np.random.default_rng(0)
    sdir = os.path.join(root, "val", "s00000")
    os.makedirs(os.path.join(sdir, "seq0"))
    os.makedirs(os.path.join(sdir, "seq1"))
    poses, intr = [], []

    def add(name):
        img = rng.integers(0, 255, (src_wh[1], src_wh[0], 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(sdir, name), img, [cv2.IMWRITE_JPEG_QUALITY, 92])
        q = qnorm(rng.normal(size=4))
        t = rng.normal(size=3)
        poses.append(f"{name} " + " ".join(f"{v:.6f}" for v in [*q, *t]))
        intr.append(f"{name} 520.0 520.0 270.0 360.0 {src_wh[0]} {src_wh[1]}")

    add("seq0/frame_00000.jpg")
    for i in range(n_frames):
        add(f"seq1/frame_{i:05}.jpg")
    with open(os.path.join(sdir, "poses.txt"), "w") as f:
        f.write("\n".join(poses) + "\n")
    with open(os.path.join(sdir, "intrinsics.txt"), "w") as f:
        f.write("\n".join(intr) + "\n")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=120)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--workers", type=int, default=8)
    args = parser.parse_args()

    from mickey_tpu.config import default_config
    from mickey_tpu.data import DataModule
    from mickey_tpu.data.native import ensure_built

    root = tempfile.mkdtemp(prefix="mickey_loader_bench_")
    try:
        synth_scene(root, args.frames)
        cfg = default_config()
        cfg.DATASET.DATA_ROOT = root
        cfg.TRAINING.BATCH_SIZE = args.batch
        cfg.TRAINING.NUM_WORKERS = args.workers
        # score every query frame (no x5 subsample thinning the epoch)
        n_pairs = len(DataModule(cfg, drop_last_val=False).val_dataloader().dataset)
        print(
            f"== loader bench: {n_pairs} pairs of 720x540 JPEGs, batch {args.batch}, "
            f"{args.workers} workers, native={'yes' if ensure_built() else 'NO'} ==",
            flush=True,
        )

        for name, native in (("native", True), ("cv2", False)):
            cfg.TRAINING.NATIVE_LOADER = native
            loader = DataModule(cfg, drop_last_val=False).val_dataloader()
            list(loader)  # warm page cache
            t0 = time.perf_counter()
            n = 0
            for b in loader:
                n += b["image0"].shape[0]
            dt = time.perf_counter() - t0
            print(f"{name:8s} {dt:7.3f} s epoch   {n/dt:8.1f} pairs/s", flush=True)

        # decode-once raw cache (data/raw_cache.py): the pod-rate path
        from mickey_tpu.data.raw_cache import build_scene_cache

        t0 = time.perf_counter()
        build_scene_cache(
            os.path.join(root, "val", "s00000"), (cfg.DATASET.WIDTH, cfg.DATASET.HEIGHT)
        )
        print(f"rawcache build {time.perf_counter()-t0:7.3f} s (one-time)", flush=True)
        loader = DataModule(cfg, drop_last_val=False).val_dataloader()
        list(loader)  # warm page cache + memmap
        for rep in range(2):
            t0 = time.perf_counter()
            n = 0
            for b in loader:
                assert b["image0"].dtype == np.uint8, "raw cache path not taken"
                n += b["image0"].shape[0]
            dt = time.perf_counter() - t0
            print(f"rawcache {dt:7.3f} s epoch   {n/dt:8.1f} pairs/s", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
