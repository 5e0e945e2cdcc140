"""Frozen-backbone feature cache: build, parity with the staged step, guards.

The cache (training/feature_cache.py) is valid because MicKey's DINOv2 is
frozen (reference mickey_extractor.py:48-51) and the shipped Map-free
recipes use no augmentation (reference config/datasets/mapfree.yaml).
fp32 storage must be BIT-identical to the staged train step; bf16 storage
must stay inside the backbone's accepted bf16 envelope.
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_training import train_cfg

from mickey_tpu.data import MapFreeDataset
from mickey_tpu.data.loader import collate
from mickey_tpu.nn.extractor import backbone_features, model_init
from mickey_tpu.training.feature_cache import (
    FeatureCache,
    build_feature_cache,
    frame_key,
    unique_frames,
)
from mickey_tpu.training.train_step import init_train_state, make_staged_train_step


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    """One train scene in Map-free layout (7 frames, 5 overlap pairs)."""
    import cv2

    rng = np.random.default_rng(3)
    root = tmp_path_factory.mktemp("fcache_data")
    sdir = root / "train" / "s0"
    (sdir / "seq0").mkdir(parents=True)
    (sdir / "seq1").mkdir(parents=True)
    poses, intr = [], []

    def add(name):
        cv2.imwrite(str(sdir / name), rng.uniform(0, 255, (130, 116, 3)).astype(np.uint8))
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        t = rng.normal(size=3) * 0.3
        poses.append(f"{name} " + " ".join(f"{v:.6f}" for v in [*q, *t]))
        intr.append(f"{name} 110.0 110.0 58.0 65.0 116 130")

    add("seq0/frame_00000.jpg")
    for i in range(6):
        add(f"seq1/frame_{i:05}.jpg")
    (sdir / "poses.txt").write_text("\n".join(poses) + "\n")
    (sdir / "intrinsics.txt").write_text("\n".join(intr) + "\n")
    idxs = np.array([[1, i, 1, i + 1] for i in range(5)], dtype=np.uint16)
    np.savez(sdir / "overlaps.npz", idxs=idxs, overlaps=np.full(5, 0.5))
    return root


def _cfg(root):
    cfg = train_cfg(root)
    cfg.DATASET.MIN_OVERLAP_SCORE = 0.0
    cfg.DATASET.MAX_OVERLAP_SCORE = 1.0
    return cfg


def _batch(ds, cfg, n=2):
    b = collate([ds[i] for i in range(n)])
    return b


class TestBuildAndGather:
    def test_fp32_rows_bit_identical_to_backbone(self, scene_root, tmp_path):
        cfg = _cfg(scene_root)
        ds = MapFreeDataset(cfg, "train")
        params = model_init(jax.random.PRNGKey(0), cfg)
        cache = build_feature_cache(
            cfg, params["dinov2"], ds, tmp_path / "c32", batch_size=4, dtype="float32"
        )
        frames = unique_frames(ds)
        # pairs are consecutive seq1 frames (0..5) -> 6 unique frames, not
        # 10 pair slots (dedup across pairs is the point of the cache)
        assert len(cache) == len(frames) == 6

        # direct backbone on the first two frames, same decode path
        from mickey_tpu.data.io import read_color_image

        keys = [frames[0][0], frames[1][0]]
        imgs = np.stack([read_color_image(k, frames[0][1]) for k in keys])
        direct = np.asarray(
            backbone_features({"dinov2": params["dinov2"]}, jnp.asarray(imgs), cfg)
        )
        got = cache.gather(keys)
        assert got.dtype == np.float32
        np.testing.assert_array_equal(got, direct)

    def test_bf16_rows_inside_envelope(self, scene_root, tmp_path):
        cfg = _cfg(scene_root)
        ds = MapFreeDataset(cfg, "train")
        params = model_init(jax.random.PRNGKey(0), cfg)
        cache = build_feature_cache(
            cfg, params["dinov2"], ds, tmp_path / "c16", batch_size=4, dtype="bfloat16"
        )
        frames = unique_frames(ds)
        from mickey_tpu.data.io import read_color_image

        k, rs = frames[0]
        img = read_color_image(k, rs)[None]
        direct = np.asarray(
            backbone_features({"dinov2": params["dinov2"]}, jnp.asarray(img), cfg)
        )[0]
        got = cache.gather([k])[0].astype(np.float32)
        # bf16 rounding: ~8-bit mantissa relative error on a normalized fmap
        denom = np.maximum(np.abs(direct), 1e-2)
        assert np.max(np.abs(got - direct) / denom) < 0.01

    def test_augmentation_guard(self, scene_root, tmp_path):
        cfg = _cfg(scene_root)
        cfg.DATASET.AUGMENTATION_TYPE = "colorjitter"
        ds = MapFreeDataset(cfg, "train")
        params = model_init(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError, match="AUGMENTATION_TYPE"):
            build_feature_cache(cfg, params["dinov2"], ds, tmp_path / "cbad")


class TestCachedStepParity:
    def test_fp32_cache_matches_staged_step(self, scene_root, tmp_path):
        """grad_step on fp32-cached features == the staged train step, to fp
        tolerance, on a real loader batch (image-free batch pytree)."""
        cfg = _cfg(scene_root)
        ds = MapFreeDataset(cfg, "train")
        params = model_init(jax.random.PRNGKey(0), cfg)
        cache = build_feature_cache(
            cfg, params["dinov2"], ds, tmp_path / "cstep", batch_size=4, dtype="float32"
        )

        batch = _batch(ds, cfg, n=2)
        arrays = {
            k: jnp.asarray(np.asarray(batch[k], np.float32))
            for k in ("image0", "image1", "T_0to1", "K_color0", "K_color1",
                      "Kori_color0", "Kori_color1")
        }
        key = jax.random.PRNGKey(11)
        topk = jnp.float32(80.0)
        step = make_staged_train_step(cfg)

        fresh = jax.tree_util.tree_map(jnp.array, params)
        state, backbone = init_train_state(cfg, fresh)
        s_ref, m_ref = step(state, backbone, arrays, key, topk)

        keys0 = [frame_key(sr, p[0]) for sr, p in zip(batch["scene_root"], batch["pair_names"])]
        keys1 = [frame_key(sr, p[1]) for sr, p in zip(batch["scene_root"], batch["pair_names"])]
        fmap = jnp.asarray(cache.gather(keys0 + keys1))
        no_images = {k: v for k, v in arrays.items() if not k.startswith("image")}
        fresh2 = jax.tree_util.tree_map(jnp.array, params)
        state2, _ = init_train_state(cfg, fresh2)
        s_c, m_c = step.grad_step(state2, fmap, no_images, key, topk)

        assert float(m_ref["grads_finite"]) == 1.0
        np.testing.assert_allclose(float(m_c["loss"]), float(m_ref["loss"]), rtol=1e-6)
        np.testing.assert_allclose(
            float(m_c["grad_norm"]), float(m_ref["grad_norm"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(s_c.params), jax.tree_util.tree_leaves(s_ref.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestTrainerIntegration:
    def test_fit_builds_and_trains_from_cache(self, scene_root, tmp_path):
        """MicKeyTrainer with TPU.FEATURE_CACHE: fit builds the cache, then
        every training step runs image-free from cached features."""
        from mickey_tpu.data.loader import DataModuleTraining
        from mickey_tpu.models.training_model import MicKeyTrainer

        # add a val scene (fit runs validation)
        import cv2

        rng = np.random.default_rng(5)
        sdir = Path(scene_root) / "val" / "sv"
        if not sdir.exists():
            (sdir / "seq0").mkdir(parents=True)
            (sdir / "seq1").mkdir(parents=True)
            poses, intr = [], []

            def add(name):
                cv2.imwrite(str(sdir / name), rng.uniform(0, 255, (130, 116, 3)).astype(np.uint8))
                q = rng.normal(size=4)
                q /= np.linalg.norm(q)
                t = rng.normal(size=3) * 0.3
                poses.append(f"{name} " + " ".join(f"{v:.6f}" for v in [*q, *t]))
                intr.append(f"{name} 110.0 110.0 58.0 65.0 116 130")

            add("seq0/frame_00000.jpg")
            for i in range(6):
                add(f"seq1/frame_{i:05}.jpg")
            (sdir / "poses.txt").write_text("\n".join(poses) + "\n")
            (sdir / "intrinsics.txt").write_text("\n".join(intr) + "\n")

        cfg = _cfg(scene_root)
        cfg.TRAINING.BATCH_SIZE = 8
        cfg.TRAINING.N_SAMPLES_SCENE = 8
        cfg.TRAINING.EPOCHS = 1
        cfg.TRAINING.VAL_BATCHES = 1
        cfg.TRAINING.LOG_INTERVAL = 1
        cfg.TPU.FEATURE_CACHE = str(tmp_path / "trainer_cache")
        cfg.TPU.FEATURE_CACHE_DTYPE = "bfloat16"

        trainer = MicKeyTrainer(cfg, out_dir=str(tmp_path / "run"), seed=0)
        dm = DataModuleTraining(cfg)
        trainer.fit(dm, max_epochs=1, val_batches=1, log_interval=10)
        assert trainer.global_step >= 1
        assert trainer.feature_cache is not None
        assert FeatureCache.exists(cfg.TPU.FEATURE_CACHE)
        # second trainer with the SAME backbone (same seed) reopens the
        # existing cache instead of rebuilding
        trainer2 = MicKeyTrainer(cfg, out_dir=str(tmp_path / "run2"), seed=0)
        trainer2.fit(dm, max_epochs=1, val_batches=1, log_interval=10)
        assert trainer2.global_step >= 1
        # a DIFFERENT backbone (other random init) must be rejected — the
        # stored fingerprint catches silently-stale features
        trainer3 = MicKeyTrainer(cfg, out_dir=str(tmp_path / "run3"), seed=1)
        with pytest.raises(ValueError, match="DIFFERENT backbone"):
            trainer3.fit(dm, max_epochs=1, val_batches=1, log_interval=10)
        # requesting a different storage dtype than the cache holds: explicit
        cfg2 = _cfg(scene_root)
        cfg2.TRAINING.BATCH_SIZE = 8
        cfg2.TPU.FEATURE_CACHE = cfg.TPU.FEATURE_CACHE
        cfg2.TPU.FEATURE_CACHE_DTYPE = "float32"
        trainer4 = MicKeyTrainer(cfg2, out_dir=str(tmp_path / "run4"), seed=0)
        with pytest.raises(ValueError, match="FEATURE_CACHE_DTYPE"):
            trainer4.fit(dm, max_epochs=1, val_batches=1, log_interval=10)

    def test_staged_train_required(self, scene_root, tmp_path):
        from mickey_tpu.models.training_model import MicKeyTrainer

        cfg = _cfg(scene_root)
        cfg.TPU.FEATURE_CACHE = str(tmp_path / "x")
        cfg.TPU.STAGED_TRAIN = False
        with pytest.raises(ValueError, match="STAGED_TRAIN"):
            MicKeyTrainer(cfg, out_dir=str(tmp_path / "runx"), seed=0)

    def test_trainer_augmentation_guard(self, scene_root, tmp_path):
        from mickey_tpu.models.training_model import MicKeyTrainer

        cfg = _cfg(scene_root)
        cfg.TPU.FEATURE_CACHE = str(tmp_path / "y")
        cfg.DATASET.AUGMENTATION_TYPE = "colorjitter"
        with pytest.raises(ValueError, match="AUGMENTATION_TYPE"):
            MicKeyTrainer(cfg, out_dir=str(tmp_path / "runy"), seed=0)

    def test_trainer_black_white_guard(self, scene_root, tmp_path):
        """BLACK_WHITE applies a deterministic grayscale transform the cache
        builder does not replicate — must refuse, not silently mismatch."""
        from mickey_tpu.models.training_model import MicKeyTrainer

        cfg = _cfg(scene_root)
        cfg.TPU.FEATURE_CACHE = str(tmp_path / "z")
        cfg.DATASET.BLACK_WHITE = True
        with pytest.raises(ValueError, match="BLACK_WHITE"):
            MicKeyTrainer(cfg, out_dir=str(tmp_path / "runz"), seed=0)
