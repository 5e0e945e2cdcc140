"""Optional native (C++) batched image ingest.

``native/mickey_io.cpp`` provides threaded JPEG decode + bilinear resize +
normalization with the GIL released — the native-runtime counterpart of the
reference's cv2-in-worker-processes ingest. cv2 (itself C++/libjpeg-turbo)
remains the default decoder; this path exists for GIL-free in-process
batching and as the framework's native IO layer.

Build: ``python native/build.py`` (g++ + system libjpeg, no downloads).
"""

from __future__ import annotations

import os
import sys
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")

_mod = None
# loader prefetch workers race into ensure_built on first use; without the
# lock several threads could run the g++ build of the same .so concurrently
# and clobber each other's output
_build_lock = threading.Lock()


def ensure_built(auto_build: bool = True):
    """Import (building if needed) the _mickey_io extension; None if unavailable.

    Thread-safe: the whole import-or-build sequence runs under a module lock
    (concurrent loader workers must not compile the same .so twice)."""
    global _mod
    if _mod is not None:
        return _mod
    with _build_lock:
        if _mod is not None:
            return _mod
        if _NATIVE_DIR not in sys.path:
            sys.path.insert(0, _NATIVE_DIR)
        try:
            import _mickey_io  # type: ignore

            _mod = _mickey_io
            return _mod
        except ImportError:
            if not auto_build:
                return None
        try:
            from build import build  # type: ignore

            build(verbose=False)
            import _mickey_io  # type: ignore

            _mod = _mickey_io
            return _mod
        except Exception:
            return None


def decode_resize_batch(
    jpeg_bytes: List[bytes], width: int, height: int, num_threads: int = 8
) -> Optional[np.ndarray]:
    """Batched decode via the native module; None if it isn't available."""
    mod = ensure_built()
    if mod is None:
        return None
    return mod.decode_resize_batch(jpeg_bytes, width, height, num_threads=num_threads)


def read_batch(paths, width: int, height: int, num_threads: int = 8) -> Optional[np.ndarray]:
    """Read + decode + resize a batch of JPEG files natively; (B, H, W, 3) f32.

    ``num_threads`` is clamped to the host's CPU count: oversubscribing a
    small host is pathological, not just wasteful (on a 1-core VM, 8 decode
    threads measured 15-100x slower than 1 — BENCHLOG round 3)."""
    mod = ensure_built()
    if mod is None:
        return None
    blobs = []
    for p in paths:
        with open(p, "rb") as f:
            blobs.append(f.read())
    threads = max(1, min(num_threads, os.cpu_count() or 1))
    return mod.decode_resize_batch(blobs, width, height, num_threads=threads)
