"""Map-free relocalization dataset (host-side, numpy).

Counterpart of reference ``lib/datasets/mapfree.py``: per-scene pose /
intrinsics / overlap parsing, train-pair filtering by overlap range, relative
pose construction via quaternion algebra, val/test x5 query subsampling.

Layout (per scene directory):
    poses.txt        imgpath qw qx qy qz tx ty tz   (world->cam)
    intrinsics.txt   imgpath fx fy cx cy W H
    overlaps.npz     idxs (N, 4) uint16, overlaps (N,)   [train scenes]
    seq0/ seq1/      frame_%05d.jpg
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..geometry.rotations import qinverse, qmult, quat2mat, rotate_vector
from .io import correct_intrinsic_scale, read_color_image


class MapFreeScene:
    def __init__(
        self,
        scene_root,
        resize: Tuple[int, int],
        sample_factor: int = 1,
        overlap_limits: Optional[Tuple[float, float]] = None,
        transforms=None,
        test_scene: bool = False,
    ):
        self.scene_root = Path(scene_root)
        self.resize = resize
        self.sample_factor = sample_factor
        self.transforms = transforms
        self.test_scene = test_scene

        self.poses = self.read_poses(self.scene_root)
        self.K, self.K_ori = self.read_intrinsics(self.scene_root, resize)
        self.pairs = self.load_pairs(self.scene_root, overlap_limits, sample_factor)

    @staticmethod
    def read_intrinsics(scene_root: Path, resize=None):
        Ks, K_ori = {}, {}
        with (scene_root / "intrinsics.txt").open("r") as f:
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

    @staticmethod
    def read_poses(scene_root: Path):
        poses = {}
        with (scene_root / "poses.txt").open("r") as f:
            for line in f.readlines():
                if "#" in line:
                    continue
                parts = line.strip().split(" ")
                qt = np.array(list(map(float, parts[1:])))
                poses[parts[0]] = (qt[:4], qt[4:])
        return poses

    def load_pairs(self, scene_root: Path, overlap_limits=None, sample_factor: int = 1):
        """Train: overlap-filtered (seqA,imA,seqB,imB) rows from overlaps.npz.
        Val/test: keyframe paired with every sample_factor-th query frame
        (reference mapfree.py:74-103)."""
        overlaps_path = scene_root / "overlaps.npz"
        if overlaps_path.exists():
            f = np.load(overlaps_path, allow_pickle=True)
            idxs, overlaps = f["idxs"], f["overlaps"]
            if overlap_limits is not None:
                min_overlap, max_overlap = overlap_limits
                mask = (overlaps > min_overlap) * (overlaps < max_overlap)
                idxs = idxs[mask]
                return idxs.copy()
            return idxs.copy()
        idxs = np.zeros((len(self.poses) - 1, 4), dtype=np.uint16)
        idxs[:, 2] = 1
        idxs[:, 3] = np.array(
            [int(fn[-9:-4]) for fn in self.poses.keys() if "seq0" not in fn], dtype=np.uint16
        )
        return idxs[::sample_factor]

    def get_pair_path(self, pair):
        seqA, imgA, seqB, imgB = pair
        return (f"seq{seqA}/frame_{imgA:05}.jpg", f"seq{seqB}/frame_{imgB:05}.jpg")

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, index) -> Dict:
        im1_path, im2_path = self.get_pair_path(self.pairs[index])

        image1 = read_color_image(self.scene_root / im1_path, self.resize, augment_fn=self.transforms)
        image2 = read_color_image(self.scene_root / im2_path, self.resize, augment_fn=self.transforms)

        if self.test_scene:
            q1 = q2 = np.zeros(4)
            c1 = c2 = np.zeros(3)
            T = np.zeros((4, 4), dtype=np.float32)
        else:
            q1, t1 = self.poses[im1_path]
            q2, t2 = self.poses[im2_path]
            c1 = rotate_vector(-t1, qinverse(q1))
            c2 = rotate_vector(-t2, qinverse(q2))
            q12 = qmult(q2, qinverse(q1))
            t12 = t2 - rotate_vector(t1, q12)
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = quat2mat(q12)
            T[:3, -1] = t12

        return {
            "image0": image1,  # (H, W, 3) float32
            "image1": image2,
            "T_0to1": T,
            "abs_q_0": q1,
            "abs_c_0": c1,
            "abs_q_1": q2,
            "abs_c_1": c2,
            "K_color0": self.K[im1_path],
            "Kori_color0": self.K_ori[im1_path],
            "K_color1": self.K[im2_path],
            "Kori_color1": self.K_ori[im2_path],
            "dataset_name": "Mapfree",
            "scene_id": self.scene_root.stem,
            "scene_root": str(self.scene_root),
            "pair_id": index * self.sample_factor,
            "pair_names": (im1_path, im2_path),
        }


class ConcatDataset:
    """Minimal torch-free ConcatDataset."""

    def __init__(self, datasets: List):
        self.datasets = datasets
        self.cumulative_sizes = np.cumsum([len(d) for d in datasets]).tolist()

    def __len__(self):
        return self.cumulative_sizes[-1] if self.cumulative_sizes else 0

    def __getitem__(self, idx):
        ds = int(np.searchsorted(self.cumulative_sizes, idx, side="right"))
        lo = 0 if ds == 0 else self.cumulative_sizes[ds - 1]
        return self.datasets[ds][idx - lo]


class MapFreeDataset(ConcatDataset):
    def __init__(self, cfg, mode: str, transforms=None):
        assert mode in ("train", "val", "test"), "Invalid dataset mode"
        data_root = Path(cfg.DATASET.DATA_ROOT) / mode
        resize = (cfg.DATASET.WIDTH, cfg.DATASET.HEIGHT)
        test_scene = mode == "test"
        overlap_limits = (cfg.DATASET.MIN_OVERLAP_SCORE, cfg.DATASET.MAX_OVERLAP_SCORE)
        sample_factor = {"train": 1, "val": 5, "test": 5}[mode]

        scenes = cfg.DATASET.SCENES
        if scenes is None:
            scenes = sorted(s.name for s in data_root.iterdir() if s.is_dir())
        if cfg.DEBUG:
            scenes = scenes[:30] if mode == "train" else scenes[:10] if mode == "val" else scenes

        super().__init__(
            [
                MapFreeScene(data_root / s, resize, sample_factor, overlap_limits, transforms, test_scene)
                for s in scenes
            ]
        )
