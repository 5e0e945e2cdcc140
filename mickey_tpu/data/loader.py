"""Threaded prefetching batch loader (counterpart of lib/datasets/datamodules.py).

Replaces torch DataLoader: batches are decoded while the accelerator
computes, behind a bounded prefetch queue of ready numpy batches. The
default decode backend is the native C++ ingest (``native/mickey_io.cpp``:
one GIL-free call per batch — threaded JPEG decode + bilinear resize +
normalize, already stacked (B, H, W, 3) float32); cv2-per-sample is the
automatic fallback when the extension is unavailable or augmentation
transforms are configured. Batches are dicts of stacked numpy arrays for
array fields and lists for string fields — the same collation contract as
the reference's default torch collate.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List

import numpy as np

from .mapfree import MapFreeDataset
from .sampler import RandomConcatSampler

_ARRAY_KEYS = (
    "image0",
    "image1",
    "T_0to1",
    "abs_q_0",
    "abs_c_0",
    "abs_q_1",
    "abs_c_1",
    "K_color0",
    "Kori_color0",
    "K_color1",
    "Kori_color1",
)


def collate(samples: List[Dict]) -> Dict:
    batch: Dict = {}
    for k in samples[0]:
        if k in _ARRAY_KEYS:
            stacked = np.stack([np.asarray(s[k]) for s in samples])
            # uint8 images stay uint8: they travel to the device 4x smaller
            # and normalization fuses on-device (nn/extractor.normalize_images)
            if not (k in ("image0", "image1") and stacked.dtype == np.uint8):
                stacked = stacked.astype(np.float32)
            batch[k] = stacked
        else:
            batch[k] = [s[k] for s in samples]
    return batch


class DataLoader:
    """Iterate dataset[indices] in batches with threaded prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        sampler=None,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 8,
        prefetch: int = 4,
        seed: int = 0,
        native_io: bool = True,
        meta_only: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        # meta_only: batches carry pair metadata but NO decoded images —
        # feature-cache training (training/feature_cache.py) reads backbone
        # features from the cache and never touches the JPEGs, so the whole
        # decode budget disappears from the training host-IO path
        self.meta_only = meta_only
        self.sampler = sampler
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.native_io = native_io
        self._native_batch = None  # lazily resolved decode backend
        self._epoch = 0
        # set by the trainer after the cache is built/opened: meta-only
        # batches then carry the gathered feature rows as batch["fmap"]
        # ((2B, Hp, Wp, C), image0-rows then image1-rows), so the memmap
        # reads happen in the prefetch workers, overlapped with compute
        self.feature_cache = None

    def _native_usable(self) -> bool:
        """Native batch ingest applies when the extension builds, the dataset
        exposes per-sample paths/meta, and no augmentation is configured."""
        if not self.native_io or not hasattr(self.dataset, "locate"):
            return False
        if any(getattr(d, "transforms", None) is not None for d in self.dataset.datasets):
            return False
        from .native import ensure_built

        return ensure_built() is not None

    def _indices(self) -> List[int]:
        if self.sampler is not None:
            return list(iter(self.sampler))
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            idx = np.random.default_rng(self.seed + self._epoch).permutation(idx)
        return idx.tolist()

    def __len__(self) -> int:
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict]:
        indices = self._indices()
        self._epoch += 1
        batches = [
            indices[i : i + self.batch_size] for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                # pipeline: submit item fetches, collate in order
                futures = [pool.submit(self._load_batch, b) for b in batches[: self.prefetch + 2]]
                next_submit = self.prefetch + 2
                for i in range(len(batches)):
                    if stop.is_set():
                        for f in futures:
                            f.cancel()
                        return
                    q.put(futures.pop(0).result())
                    if next_submit < len(batches):
                        futures.append(pool.submit(self._load_batch, batches[next_submit]))
                        next_submit += 1
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()

    def _load_batch(self, idxs: List[int]) -> Dict:
        if self.meta_only:
            samples = []
            for i in idxs:
                ds, local = self.dataset.locate(i)
                samples.append(ds.sample_meta(local))
            batch = collate(samples)
            if self.feature_cache is not None:
                from ..training.feature_cache import frame_key

                keys = [
                    frame_key(sr, p[half])
                    for half in (0, 1)
                    for sr, p in zip(batch["scene_root"], batch["pair_names"])
                ]
                batch["fmap"] = self.feature_cache.gather(keys)
            return batch
        batch = self._load_batch_rawcache(idxs)
        if batch is not None:
            return batch
        if self._native_batch is None:
            self._native_batch = self._native_usable()
        if self._native_batch:
            batch = self._load_batch_native(idxs)
            if batch is not None:
                return batch
            self._native_batch = False  # decode backend failed: fall back for good
        return collate([self.dataset[i] for i in idxs])

    def _load_batch_rawcache(self, idxs: List[int]) -> Dict:
        """Decode-free ingest from per-scene uint8 raw caches (memcpy-bound;
        data/raw_cache.py). Applies only when EVERY pair in the batch has a
        cache and no augmentation transforms are configured."""
        if not hasattr(self.dataset, "locate"):
            return None
        samples = []
        for i in idxs:
            ds, local = self.dataset.locate(i)
            if getattr(ds, "transforms", None) is not None or not hasattr(ds, "raw_images"):
                return None
            imgs = ds.raw_images(local)
            if imgs is None:
                return None
            s = ds.sample_meta(local)
            s["image0"], s["image1"] = imgs
            samples.append(s)
        return collate(samples)

    def _load_batch_native(self, idxs: List[int]) -> Dict:
        """One GIL-free native call decodes the whole batch (2B JPEGs)."""
        from .native import read_batch

        samples, paths, resize = [], [], None
        for i in idxs:
            ds, local = self.dataset.locate(i)
            samples.append(ds.sample_meta(local))
            p0, p1 = ds.image_paths(local)
            paths.extend((p0, p1))
            resize = ds.resize
        images = read_batch(
            paths, width=resize[0], height=resize[1], num_threads=self.num_workers
        )
        if images is None:
            return None
        for j, s in enumerate(samples):
            s["image0"] = images[2 * j]
            s["image1"] = images[2 * j + 1]
        return collate(samples)


class DataModule:
    """Eval-oriented loaders (reference DataModule, datamodules.py:12-67)."""

    def __init__(self, cfg, drop_last_val: bool = True):
        self.cfg = cfg
        self.drop_last_val = drop_last_val
        assert cfg.DATASET.DATA_SOURCE == "MapFree", "unsupported DATA_SOURCE"

    def _sampler(self, dataset, reset_epoch=False, seed=66):
        if self.cfg.TRAINING.SAMPLER == "scene_balance":
            return RandomConcatSampler(
                dataset,
                self.cfg.TRAINING.N_SAMPLES_SCENE,
                self.cfg.TRAINING.SAMPLE_WITH_REPLACEMENT,
                shuffle=True,
                reset_on_iter=reset_epoch,
                seed=seed,
            )
        return None

    def _transforms(self):
        if self.cfg.DATASET.AUGMENTATION_TYPE == "colorjitter":
            from .augment import color_jitter

            return color_jitter
        if self.cfg.DATASET.BLACK_WHITE:
            from .augment import grayscale

            return grayscale
        return None

    def train_dataloader(self) -> DataLoader:
        dataset = MapFreeDataset(self.cfg, "train", transforms=self._transforms())
        return DataLoader(
            dataset,
            self.cfg.TRAINING.BATCH_SIZE,
            sampler=self._sampler(dataset),
            num_workers=self.cfg.TRAINING.NUM_WORKERS,
            native_io=self.cfg.TRAINING.get("NATIVE_LOADER", True),
            # feature-cache training never reads the JPEGs (see DataLoader)
            meta_only=bool(self.cfg.TPU.get("FEATURE_CACHE", "")),
        )

    def val_dataloader(self) -> DataLoader:
        dataset = MapFreeDataset(self.cfg, "val")
        return DataLoader(
            dataset,
            self.cfg.TRAINING.BATCH_SIZE,
            drop_last=self.drop_last_val,
            num_workers=self.cfg.TRAINING.NUM_WORKERS,
            native_io=self.cfg.TRAINING.get("NATIVE_LOADER", True),
        )

    def test_dataloader(self) -> DataLoader:
        dataset = MapFreeDataset(self.cfg, "test")
        return DataLoader(
            dataset,
            self.cfg.TRAINING.BATCH_SIZE,
            drop_last=self.drop_last_val,
            num_workers=self.cfg.TRAINING.NUM_WORKERS,
            native_io=self.cfg.TRAINING.get("NATIVE_LOADER", True),
        )


class DataModuleTraining(DataModule):
    """Training loaders with seeded samplers (reference DataModuleTraining)."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.seed = cfg.DATASET.SEED

    def train_dataloader(self) -> DataLoader:
        dataset = MapFreeDataset(self.cfg, "train", transforms=self._transforms())
        return DataLoader(
            dataset,
            self.cfg.TRAINING.BATCH_SIZE,
            sampler=self._sampler(dataset, seed=self.seed),
            num_workers=self.cfg.TRAINING.NUM_WORKERS,
            native_io=self.cfg.TRAINING.get("NATIVE_LOADER", True),
            meta_only=bool(self.cfg.TPU.get("FEATURE_CACHE", "")),
        )

    def val_dataloader(self) -> DataLoader:
        dataset = MapFreeDataset(self.cfg, "val")
        return DataLoader(
            dataset,
            self.cfg.TRAINING.BATCH_SIZE,
            sampler=self._sampler(dataset, reset_epoch=True),
            drop_last=True,
            num_workers=self.cfg.TRAINING.NUM_WORKERS,
            native_io=self.cfg.TRAINING.get("NATIVE_LOADER", True),
        )
