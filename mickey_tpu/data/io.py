"""Image and intrinsics IO (host-side; counterpart of lib/datasets/utils.py).

Activations are NHWC float32 in [0, 1]; the reference's (3, H, W) tensors
become (H, W, 3) arrays. Resizing matches cv2.resize defaults (INTER_LINEAR)
used by the reference (datasets/utils.py:71, demo read path).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np


def read_color_image(path, resize: Optional[Tuple[int, int]] = None, augment_fn=None) -> np.ndarray:
    """Read an RGB image as (H, W, 3) float32 in [0, 1]; resize is (W, H)."""
    import cv2

    image = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if image is None:
        raise FileNotFoundError(path)
    image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
    if resize is not None:
        image = cv2.resize(image, resize)
    image = image.astype(np.float32) / 255.0
    if augment_fn is not None:
        image = augment_fn(image)
    return image


def read_depth_image(path) -> np.ndarray:
    import cv2

    depth = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    return depth.astype(np.float32) / 1000.0


def correct_intrinsic_scale(K: np.ndarray, scale_x: float, scale_y: float) -> np.ndarray:
    """Rescale intrinsics for resized images, with the -0.5 principal point
    correction (reference datasets/utils.py:86-99)."""
    transform = np.eye(3, dtype=np.float32)
    transform[0, 0] = scale_x
    transform[0, 2] = scale_x / 2 - 0.5
    transform[1, 1] = scale_y
    transform[1, 2] = scale_y / 2 - 0.5
    return transform @ K.astype(np.float32)


def read_intrinsics(path, resize: Optional[Tuple[int, int]] = None):
    """Parse an intrinsics.txt (img_name fx fy cx cy W H per line).

    Returns ({img_name: K (3,3) float32}, {img_name: K_original}).
    Counterpart of MapFreeScene.read_intrinsics (mapfree.py:33-48).
    """
    Ks: Dict[str, np.ndarray] = {}
    K_ori: Dict[str, np.ndarray] = {}
    with Path(path).open("r") as f:
        for line in f.readlines():
            if "#" in line:
                continue
            parts = line.strip().split(" ")
            img_name = parts[0]
            fx, fy, cx, cy, W, H = map(float, parts[1:])
            K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float32)
            K_ori[img_name] = K
            if resize is not None:
                K = correct_intrinsic_scale(K, resize[0] / W, resize[1] / H)
            Ks[img_name] = K
    return Ks, K_ori


def pad_to_multiple(image: np.ndarray, df: int = 14) -> np.ndarray:
    """Crop H, W down to multiples of df (reference crops, not pads:
    mickey_extractor.py:46)."""
    h, w = image.shape[:2]
    return image[: df * (h // df), : df * (w // df)]
