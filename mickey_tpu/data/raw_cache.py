"""Decode-once raw uint8 image cache — pod-rate host ingest.

An 8-chip v5e pod at ~24 pairs/s/chip consumes ~190 pairs/s of decoded
540x720 pairs; JPEG decode costs ~10-20 ms/image/core, so the decode path
needs many host cores (the reference leans on 8 cv2 worker processes,
``lib/datasets/datamodules.py:36-38``). The TPU-native fix is to stop paying
decode per epoch at all: each scene's JPEGs are decoded ONCE at the working
resolution into a packed uint8 ``(N, H, W, 3)`` memmap; subsequent ingest is
a memcpy, and images travel host->device as uint8 (4x less transfer) where
the ``/255`` normalization fuses into the backbone's first matmul
(nn/extractor.normalize_images).

Layout per scene:  <scene>/rawcache_{W}x{H}.u8   packed C-order uint8 frames
                   <scene>/rawcache_{W}x{H}.json {"frames": {relpath: row}}

Numerics: cached pixels are exactly the uint8 output of the cv2
decode+INTER_LINEAR-resize pipeline (data/io.read_color_image before its
/255), so cache-fed and JPEG-fed batches are bit-identical after
normalization.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np


def cache_paths(scene_root, resize: Tuple[int, int]) -> Tuple[Path, Path]:
    w, h = resize
    base = Path(scene_root) / f"rawcache_{w}x{h}"
    return base.with_suffix(".u8"), base.with_suffix(".json")


def list_scene_frames(scene_root) -> list:
    """All frame relpaths of a scene, from intrinsics.txt (authoritative)."""
    frames = []
    with (Path(scene_root) / "intrinsics.txt").open() as f:
        for line in f:
            line = line.strip()
            if line and "#" not in line:
                frames.append(line.split(" ")[0])
    return frames


def build_scene_cache(scene_root, resize: Tuple[int, int], overwrite: bool = False) -> Path:
    """One-time decode of every frame into the packed uint8 memmap."""
    import cv2

    data_path, index_path = cache_paths(scene_root, resize)
    if data_path.exists() and index_path.exists() and not overwrite:
        return data_path
    frames = list_scene_frames(scene_root)
    w, h = resize
    mm = np.lib.format.open_memmap(
        str(data_path) + ".tmp", mode="w+", dtype=np.uint8, shape=(len(frames), h, w, 3)
    )
    for i, rel in enumerate(frames):
        img = cv2.imread(str(Path(scene_root) / rel), cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(Path(scene_root) / rel)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if (img.shape[1], img.shape[0]) != (w, h):
            img = cv2.resize(img, (w, h))  # INTER_LINEAR = read_color_image
        mm[i] = img
    mm.flush()
    del mm
    Path(str(data_path) + ".tmp").rename(data_path)
    index_path.write_text(json.dumps({"frames": {n: i for i, n in enumerate(frames)}}))
    return data_path


class SceneRawCache:
    """Read side: memmap + name->row index (None-able via ``open_if_exists``)."""

    def __init__(self, scene_root, resize: Tuple[int, int]):
        data_path, index_path = cache_paths(scene_root, resize)
        self.rows: Dict[str, int] = json.loads(index_path.read_text())["frames"]
        self.data = np.lib.format.open_memmap(data_path, mode="r")
        w, h = resize
        if self.data.shape[1:] != (h, w, 3):
            raise ValueError(f"cache shape {self.data.shape} != resize {(h, w, 3)}")

    @classmethod
    def open_if_exists(cls, scene_root, resize) -> Optional["SceneRawCache"]:
        data_path, index_path = cache_paths(scene_root, resize)
        if not (data_path.exists() and index_path.exists()):
            return None
        try:
            return cls(scene_root, resize)
        except Exception:
            return None

    def image(self, relpath: str) -> np.ndarray:
        """(H, W, 3) uint8 view (zero-copy until written)."""
        return self.data[self.rows[relpath]]
