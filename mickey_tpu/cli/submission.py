"""Map-free submission CLI (counterpart of reference submission.py).

Runs batched inference over the val/test split with image pairs sharded
across all available chips, writes per-scene ``pose_{scene}.txt`` files into
``submission.zip``.

Usage:
    python -m mickey_tpu.cli.submission --config config.yaml \
        --checkpoint weights/mickey.ckpt --split val -o results/
"""

from __future__ import annotations

import argparse
from collections import defaultdict
from dataclasses import dataclass
from pathlib import Path
from zipfile import ZipFile

import numpy as np


@dataclass
class Pose:
    image_name: str
    q: np.ndarray
    t: np.ndarray
    inliers: float

    def __str__(self) -> str:
        formatter = {"float": lambda v: f"{v:.6f}"}
        q_str = np.array2string(self.q, formatter=formatter, max_line_width=1000)[1:-1]
        t_str = np.array2string(self.t, formatter=formatter, max_line_width=1000)[1:-1]
        return f"{self.image_name} {q_str} {t_str} {self.inliers}"


def predict(loader, model, mesh=None, progress: bool = True, shared_ref=None):
    """Batched inference -> {scene: [Pose, ...]} (reference submission.py:32-61).

    Double-buffered: device compute of batch i+1 is dispatched before batch
    i's results are fetched to the host, so pose post-processing and the
    device->host transfer overlap the next batch's compute (JAX dispatch is
    async; np.asarray is the sync point). The threaded loader prefetches host
    IO on its own.

    ``shared_ref`` (default on, both arms): every Map-free query pair reuses
    the scene's seq0 keyframe as image0 (reference datasets/mapfree.py:55-58),
    but the reference re-extracts it for every pair (submission.py:32-61).
    Here the keyframe's extract outputs are cached per (scene, ref-frame) on
    device and only the query images run the backbone — single-device via
    ``call_with_ref_feats``, multi-device via the shard_mapped
    ``sharded_call_with_ref_feats`` (cached ref feats ride in batch-sharded).
    Same math on the same inputs, equality locked at 1e-6 on CPU for both
    arms (tests/test_data_pipeline.py::test_predict_shared_ref_matches_plain,
    ::test_predict_mesh_shared_ref_matches_plain); on TPU the B- vs 2B-image
    extract programs may tile differently, so low-order-bit drift can flip
    individual discrete RANSAC draws (a distribution-level no-op).
    --no_shared_ref restores the recompute path.
    """
    import jax
    import jax.numpy as jnp

    from ..geometry import mat2quat
    from ..parallel import pad_batch, shard_batch

    results_dict = defaultdict(list)
    n_devices = len(mesh.devices.reshape(-1)) if mesh is not None else 1
    key = jax.random.PRNGKey(0)
    if shared_ref is None:
        shared_ref = True
    # (scene_id, ref_frame) -> tuple of 4 per-image extract maps, each (1,...)
    # on device (~1 MB/entry); insertion-ordered for LRU-ish eviction
    ref_cache: dict = {}
    MAX_REF_CACHE = 32

    it = loader
    if progress:
        try:
            from tqdm import tqdm

            it = tqdm(loader, total=len(loader))
        except ImportError:
            pass

    def drain(out, real_b, data):
        R_b = np.asarray(out.R)[:real_b]
        t_b = np.asarray(out.t)[:real_b]
        conf_b = np.asarray(out.inliers)[:real_b]

        for i in range(real_b):
            R, t, conf = R_b[i], t_b[i].reshape(-1), float(conf_b[i])
            # skip frames without finite estimates (reference submission.py:51-52)
            if np.isnan(R).any() or np.isnan(t).any() or np.isinf(t).any():
                continue
            if np.abs(R).max() == 0:  # zero-pose fallback = no estimate
                continue
            scene = data["scene_id"][i]
            query_img = data["pair_names"][i][1]
            results_dict[scene].append(
                Pose(image_name=query_img, q=mat2quat(R).reshape(-1), t=t, inliers=conf)
            )

    def gather_ref_feats(data, image0_np, real_b, extract_fn):
        """Per-pair reference extract outputs, from the per-scene cache; new
        keyframes are extracted in a fixed-shape batch (padded rows of
        image0_np repeat the last real pair — pad_batch semantics)."""
        b_pad = image0_np.shape[0]
        pair_keys = [
            (
                data["scene_id"][min(i, real_b - 1)],
                data["pair_names"][min(i, real_b - 1)][0],
            )
            for i in range(b_pad)
        ]
        missing = [k for k in dict.fromkeys(pair_keys) if k not in ref_cache]
        if missing:  # at most one new keyframe per scene in the batch
            rows = [pair_keys.index(k) for k in missing]
            rows += rows[-1:] * (b_pad - len(rows))  # keep the batch shape
            feats = extract_fn(jnp.asarray(image0_np[rows]))
            for j, k in enumerate(missing):
                ref_cache[k] = tuple(f[j : j + 1] for f in feats)
        ref_feats = tuple(
            jnp.concatenate([ref_cache[k][j] for k in pair_keys], axis=0)
            for j in range(4)
        )
        if len(ref_cache) > MAX_REF_CACHE:  # evict oldest unused scenes
            keep = set(pair_keys)
            for k in [k for k in ref_cache if k not in keep]:
                if len(ref_cache) <= MAX_REF_CACHE:
                    break
                ref_cache.pop(k)
        return ref_feats

    in_flight = None  # (out, real_b, data) awaiting fetch
    for step, data in enumerate(it):
        arrays = {
            "image0": data["image0"],
            "image1": data["image1"],
            "K_color0": data["K_color0"],
            "K_color1": data["K_color1"],
        }
        arrays, real_b = pad_batch(arrays, max(n_devices, 1))
        step_key = jax.random.fold_in(key, step)
        if mesh is not None and n_devices > 1:
            # shard_mapped per-chip programs (Pallas kernels can't be GSPMD-
            # partitioned; see MickeyRelativePose.sharded_call). A 1-device
            # mesh takes the staged path below instead: sharded_call fuses the
            # whole pipeline into one program, which the remote-compile
            # service cannot digest (relative_pose.py staged-pipeline note).
            if shared_ref:
                ref_feats = gather_ref_feats(
                    data, np.asarray(arrays["image0"]), real_b,
                    lambda im: model.sharded_extract_feats(mesh, im),
                )
                arrays = shard_batch(mesh, arrays)
                out = model.sharded_call_with_ref_feats(
                    mesh,
                    ref_feats,
                    jnp.asarray(arrays["image1"]),
                    jnp.asarray(arrays["K_color0"]),
                    jnp.asarray(arrays["K_color1"]),
                    key=step_key,
                )
            else:
                arrays = shard_batch(mesh, arrays)
                out = model.sharded_call(
                    mesh,
                    jnp.asarray(arrays["image0"]),
                    jnp.asarray(arrays["image1"]),
                    jnp.asarray(arrays["K_color0"]),
                    jnp.asarray(arrays["K_color1"]),
                    key=step_key,
                )
        elif shared_ref:
            ref_feats = gather_ref_feats(
                data, np.asarray(arrays["image0"]), real_b, model.extract_feats
            )
            out = model.call_with_ref_feats(
                ref_feats,
                jnp.asarray(arrays["image1"]),
                jnp.asarray(arrays["K_color0"]),
                jnp.asarray(arrays["K_color1"]),
                key=step_key,
            )
        else:
            out = model(
                jnp.asarray(arrays["image0"]),
                jnp.asarray(arrays["image1"]),
                jnp.asarray(arrays["K_color0"]),
                jnp.asarray(arrays["K_color1"]),
                key=step_key,
                lite=True,  # poses only; skip materializing dense trunk outputs
            )
        if in_flight is not None:
            drain(*in_flight)
        in_flight = (out, real_b, data)
    if in_flight is not None:
        drain(*in_flight)
    return results_dict


def save_submission(results_dict: dict, output_path: Path):
    with ZipFile(output_path, "w") as zf:
        for scene, poses in results_dict.items():
            poses_str = "\n".join(str(p) for p in poses)
            zf.writestr(f"pose_{scene}.txt", poses_str.encode("utf-8"))


def eval_split(args, cfg=None, model=None):
    """Run one split end-to-end. ``cfg``/``model`` overrides let callers
    (tools/quality_run.py) inject a pre-built configuration/model."""
    from ..config import default_config
    from ..data.loader import DataModule
    from ..models import build_model
    from ..parallel import get_mesh

    if cfg is None:
        cfg = default_config()
        if args.dataset_config:
            cfg.merge_from_file(args.dataset_config)
        if args.config:
            cfg.merge_from_file(args.config)

    cfg.TRAINING.NUM_WORKERS = 8  # IO threads for the prefetching loader
    if args.split == "test":
        cfg.TRAINING.BATCH_SIZE = args.batch_size or 8
        loader = DataModule(cfg, drop_last_val=False).test_dataloader()
    elif args.split == "val":
        cfg.TRAINING.BATCH_SIZE = args.batch_size or 12
        loader = DataModule(cfg, drop_last_val=False).val_dataloader()
    else:
        raise NotImplementedError(f"Invalid split: {args.split}")

    if model is None:
        model = build_model(cfg, args.checkpoint, dinov2_path=args.dinov2)
    mesh = get_mesh()
    results_dict = predict(
        loader,
        model,
        mesh=mesh,
        shared_ref=False if getattr(args, "no_shared_ref", False) else None,
    )

    args.output_root.mkdir(parents=True, exist_ok=True)
    save_submission(results_dict, args.output_root / "submission.zip")
    print(f"Wrote {args.output_root / 'submission.zip'}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="", help="model config yaml")
    parser.add_argument("--dataset_config", default="", help="dataset config yaml")
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--dinov2", default=None)
    parser.add_argument("--output_root", "-o", type=Path, default=Path("results/"))
    parser.add_argument("--split", choices=("val", "test"), default="test")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument(
        "--no_shared_ref",
        action="store_true",
        help="disable the per-scene keyframe extract cache (recompute the "
        "reference frame for every pair, like the upstream reference)",
    )
    args = parser.parse_args()

    from ..utils.platform import apply_platform_env

    apply_platform_env()
    eval_split(args)


if __name__ == "__main__":
    main()
