"""Disk cache of frozen-backbone features: train without the DINOv2 forward.

MicKey trains keypoint heads + matcher on top of a FROZEN DINOv2 (the
reference wraps it in torch.no_grad(), mickey_extractor.py:48-51), and the
shipped Map-free recipes apply NO image augmentation
(reference config/datasets/mapfree.yaml: ``AUGMENTATION_TYPE: None``). The
backbone features of every frame are therefore CONSTANT across the whole
training run — yet the reference recomputes them every step, and the
backbone forward is ~70% of our measured train step (BENCHLOG round 3:
~271 of 390 ms/batch-8). This module precomputes each unique frame's
feature map once and memmaps it from disk, turning the train step into just
grad(heads+matcher+loss) + Adam — the TPU-native optimization the
reference's architecture leaves on the table.

Exactness: with ``dtype='float32'`` the cached step is bit-identical to the
staged step (the cache stores exactly the fp32 array the backbone program
produced). The default ``'bfloat16'`` halves disk and host->device traffic
by rounding the fp32 feature map to bf16 — a perturbation comparable to the
backbone's own accepted bf16-vs-fp32 envelope (tests/test_parity_dinov2.py);
the parity test locks both modes (tests/test_feature_cache.py).

Cache layout (one directory):
  meta.json     {"dtype", "fmap_shape": [Hp, Wp, C], "keys": {frame_key: row}}
  features.dat  (n_frames, Hp, Wp, C) memmap in the stored dtype

Frame keys are absolute image paths (str(scene_root / rel_path)) — unique
across scenes and splits. Pairs resample the same frames epoch after epoch
(scene-balanced sampler), so the one-time build cost amortizes immediately.

Scale note: at the production point a ViT-L frame is 51*38*1024 values
(~4 MB bf16) — ~4 GB per 1000 unique frames. The cache is a paging memmap;
host RAM requirements are only the working set, and the OS page cache
serves the reuse.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np

_META = "meta.json"
_DATA = "features.dat"


def check_cfg_cacheable(cfg) -> None:
    """Raise unless the configured input pipeline is deterministic per frame
    (any per-epoch or per-sample transform would make cached features stale)."""
    if cfg.DATASET.get("AUGMENTATION_TYPE") not in (None, "None", "none"):
        raise ValueError(
            "feature cache requires AUGMENTATION_TYPE=None: augmented images "
            "change per epoch, cached frozen-backbone features would be stale"
        )
    if cfg.DATASET.get("BLACK_WHITE"):
        raise ValueError(
            "feature cache does not support DATASET.BLACK_WHITE: the cache "
            "builder decodes frames without the grayscale transform, so cached "
            "features would not match the configured input pipeline"
        )


def backbone_fingerprint(backbone) -> dict:
    """Cheap identity signature of a (possibly device-resident) backbone
    pytree: one on-device scalar over all params (a single host fetch — never
    pulls the 600 MB pytree over a tunnel) plus a host-side hash of the
    shape/dtype skeleton. Stored in meta.json at build; validated at reopen
    so a cache built from different weights / a different variant cannot be
    silently reused."""
    import hashlib

    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(backbone)

    @jax.jit
    def _sig(ls):
        s = jnp.float32(0)
        for i, l in enumerate(ls):
            s = s + jnp.sum(jnp.abs(l).astype(jnp.float32)) * jnp.float32(i % 7 + 1)
        return s

    skel = "|".join(f"{tuple(l.shape)}{l.dtype}" for l in leaves)
    return {
        "param_sig": float(_sig(leaves)),
        "shape_sig": hashlib.sha1(skel.encode()).hexdigest()[:16],
        "n_leaves": len(leaves),
    }


def _check_fingerprint(meta: dict, backbone) -> None:
    want = meta.get("fingerprint")
    if not want:  # pre-fingerprint cache directory
        raise ValueError(
            "feature cache has no backbone fingerprint (built by an older "
            "version) — rebuild it (delete the directory)"
        )
    got = backbone_fingerprint(backbone)
    sig_rel = abs(got["param_sig"] - want["param_sig"]) / max(
        1.0, abs(want["param_sig"])
    )
    if (
        got["shape_sig"] != want["shape_sig"]
        or got["n_leaves"] != want["n_leaves"]
        or sig_rel > 1e-4  # tolerance: summation-order drift across backends
    ):
        raise ValueError(
            f"feature cache was built from a DIFFERENT backbone "
            f"(stored {want}, current {got}) — training on it would silently "
            f"use stale features; rebuild the cache or fix the weights"
        )


def _storage_dtype(name: str):
    if name == "float32":
        return np.dtype(np.float32)
    if name == "bfloat16":
        import ml_dtypes  # ships with jax

        return np.dtype(ml_dtypes.bfloat16)
    raise ValueError(f"unsupported feature-cache dtype {name!r}")


def frame_key(scene_root, rel_path: str) -> str:
    return str(Path(scene_root) / rel_path)


def unique_frames(dataset) -> List[Tuple[str, Tuple[int, int]]]:
    """(key, resize) for every unique frame of a ConcatDataset of scenes,
    in deterministic order. key is also the absolute image path."""
    out: List[Tuple[str, Tuple[int, int]]] = []
    seen = set()
    for scene in dataset.datasets:
        resize = tuple(scene.resize)
        for rel in list(scene.paths0) + list(scene.paths1):
            k = frame_key(scene.scene_root, rel)
            if k not in seen:
                seen.add(k)
                out.append((k, resize))
    return out


class FeatureCache:
    """Read side: open a built cache directory and gather rows by frame key.

    ``backbone``: pass the live backbone pytree to validate the stored
    fingerprint (strongly recommended — a cache built from different weights
    is silently-wrong training data otherwise). ``expect_dtype``: raise if
    the stored dtype differs from the requested one."""

    def __init__(self, root, backbone=None, expect_dtype: str = ""):
        self.root = Path(root)
        meta = json.loads((self.root / _META).read_text())
        if backbone is not None:
            _check_fingerprint(meta, backbone)
        if expect_dtype and meta["dtype"] != expect_dtype:
            raise ValueError(
                f"feature cache at {root} stores {meta['dtype']} but "
                f"{expect_dtype} was requested (FEATURE_CACHE_DTYPE) — "
                f"rebuild the cache or change the setting"
            )
        self.dtype = _storage_dtype(meta["dtype"])
        self.fmap_shape = tuple(meta["fmap_shape"])
        self.index: Dict[str, int] = meta["keys"]
        self._mm = np.memmap(
            self.root / _DATA,
            dtype=self.dtype,
            mode="r",
            shape=(len(self.index), *self.fmap_shape),
        )

    @classmethod
    def exists(cls, root) -> bool:
        return (Path(root) / _META).is_file()

    def __contains__(self, key: str) -> bool:
        return key in self.index

    def __len__(self) -> int:
        return len(self.index)

    def gather(self, keys: Sequence[str]) -> np.ndarray:
        """(len(keys), Hp, Wp, C) in the stored dtype (a copy, not a view).
        bf16 rows ship to the device as bf16 — half the transfer — and are
        upcast on-device (nn/extractor.compute_correspondences)."""
        try:
            rows = np.fromiter((self.index[k] for k in keys), np.int64, len(keys))
        except KeyError as e:
            raise KeyError(
                f"frame {e.args[0]!r} not in the feature cache at {self.root} "
                f"({len(self.index)} frames) — the dataset changed since the "
                f"cache was built; rebuild it (delete the directory)"
            ) from None
        return np.asarray(self._mm[rows])


def build_feature_cache(
    cfg,
    backbone,
    dataset,
    root,
    batch_size: int = 8,
    dtype: str = "bfloat16",
    log=None,
    mesh=None,
) -> FeatureCache:
    """Run the frozen backbone over every unique frame of ``dataset`` and
    write the cache directory. ``backbone`` is the (device-resident) frozen
    DINOv2 param pytree — pass the trainer's mesh when it is tensor-parallel
    sharded so the forward uses the same shard_mapped path as the train
    step. One jitted program at a fixed batch size (the last partial batch
    is padded) keeps compilation to a single shape."""
    import jax
    import jax.numpy as jnp

    from ..data.io import read_color_image
    from ..nn.extractor import backbone_features

    check_cfg_cacheable(cfg)

    frames = unique_frames(dataset)
    if not frames:
        raise ValueError("dataset has no frames to cache")
    store = _storage_dtype(dtype)

    @jax.jit
    def fwd(bb, images):
        return backbone_features({"dinov2": bb}, images, cfg, mesh=mesh)

    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    mm = None
    index: Dict[str, int] = {}
    n = len(frames)
    for start in range(0, n, batch_size):
        chunk = frames[start : start + batch_size]
        imgs = [read_color_image(k, resize) for k, resize in chunk]
        while len(imgs) < batch_size:  # pad the tail to the compiled shape
            imgs.append(imgs[-1])
        fmap = np.asarray(fwd(backbone, jnp.asarray(np.stack(imgs))))
        if mm is None:
            mm = np.memmap(
                root / _DATA, dtype=store, mode="w+", shape=(n, *fmap.shape[1:])
            )
        for j, (k, _) in enumerate(chunk):
            index[k] = start + j
            mm[start + j] = fmap[j].astype(store)
        if log:
            log(f"feature cache: {min(start + batch_size, n)}/{n} frames")
    mm.flush()
    (root / _META).write_text(
        json.dumps(
            {
                "dtype": dtype,
                "fmap_shape": list(mm.shape[1:]),
                "keys": index,
                "fingerprint": backbone_fingerprint(backbone),
            }
        )
    )
    return FeatureCache(root)
