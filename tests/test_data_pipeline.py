"""Integration tests: synthetic Map-free dataset -> loader -> submission -> evaluator."""

import zipfile
from pathlib import Path

import numpy as np
import pytest

from mickey_tpu.config import default_config
from mickey_tpu.data import DataModule, MapFreeDataset, RandomConcatSampler
from mickey_tpu.geometry.rotations import mat2quat, quat2mat


def tiny_cfg(data_root):
    cfg = default_config()
    cfg.MICKEY.DINOV2.VARIANT = "vit_small"
    cfg.MICKEY.DINOV2.CHANNEL_DIM = 384
    cfg.MICKEY.DINOV2.FLOAT16 = False
    cfg.MICKEY.KP_HEADS.BLOCKS_DIM = [32, 16, 128, 8]
    cfg.MICKEY.DSC_HEAD.LAST_DIM = 16
    cfg.DATASET.DATA_ROOT = str(data_root)
    cfg.DATASET.WIDTH = 112
    cfg.DATASET.HEIGHT = 126  # 8x9 patch grid (>6 so the 3-cell border mask leaves scores)
    cfg.TRAINING.BATCH_SIZE = 3
    cfg.TRAINING.NUM_WORKERS = 2
    cfg.TRAINING.N_SAMPLES_SCENE = 6
    cfg.PROCRUSTES.IT_MATCHES = 2
    cfg.PROCRUSTES.IT_RANSAC = 8
    cfg.PROCRUSTES.NUM_SAMPLED_MATCHES = 12
    cfg.PROCRUSTES.NUM_CORR_3D_3D = 3
    cfg.PROCRUSTES.NUM_REFINEMENTS = 1
    return cfg


def _rand_quat(rng):
    q = rng.normal(size=4)
    q = q / np.linalg.norm(q)
    return q if q[0] >= 0 else -q


@pytest.fixture(scope="module")
def fake_dataset(tmp_path_factory):
    """Two val scenes + one train scene in Map-free layout."""
    import cv2

    root = tmp_path_factory.mktemp("mapfree")
    rng = np.random.default_rng(0)
    n_frames = 10

    for split, scenes in (("val", ["s00000", "s00001"]), ("train", ["s00100"])):
        for scene in scenes:
            sdir = root / split / scene
            (sdir / "seq0").mkdir(parents=True)
            (sdir / "seq1").mkdir(parents=True)
            poses, intr = [], []

            def add_frame(name):
                img = (rng.uniform(0, 255, (130, 116, 3))).astype(np.uint8)
                cv2.imwrite(str(sdir / name), img)
                q = _rand_quat(rng)
                t = rng.normal(size=3) * 0.3
                poses.append(f"{name} " + " ".join(f"{v:.6f}" for v in [*q, *t]))
                intr.append(f"{name} 110.0 110.0 58.0 65.0 116 130")

            add_frame("seq0/frame_00000.jpg")
            for i in range(n_frames):
                add_frame(f"seq1/frame_{i:05}.jpg")
            (sdir / "poses.txt").write_text("\n".join(poses) + "\n")
            (sdir / "intrinsics.txt").write_text("\n".join(intr) + "\n")

            if split == "train":
                # overlap pairs between consecutive seq1 frames
                idxs = np.array(
                    [[1, i, 1, i + 1] for i in range(n_frames - 1)], dtype=np.uint16
                )
                overlaps = rng.uniform(0.3, 0.6, len(idxs))
                np.savez(sdir / "overlaps.npz", idxs=idxs, overlaps=overlaps)
    return root


class TestDataset:
    def test_val_dataset(self, fake_dataset):
        cfg = tiny_cfg(fake_dataset)
        ds = MapFreeDataset(cfg, "val")
        # 10 frames, sample factor 5 -> 2 pairs per scene, 2 scenes
        assert len(ds) == 4
        item = ds[0]
        assert item["image0"].shape == (126, 112, 3)
        assert item["T_0to1"].shape == (4, 4)
        # relative pose consistency: T = T2 @ inv(T1)
        np.testing.assert_allclose(
            np.linalg.det(item["T_0to1"][:3, :3]), 1.0, atol=1e-5
        )
        assert item["K_color0"].shape == (3, 3)
        # intrinsics rescaled for 64x72 -> 56x70
        assert abs(item["K_color0"][0, 0] - 110.0 * 112 / 116) < 1e-4

    def test_train_dataset_overlap_filtering(self, fake_dataset):
        cfg = tiny_cfg(fake_dataset)
        cfg.DATASET.MIN_OVERLAP_SCORE = 0.0
        cfg.DATASET.MAX_OVERLAP_SCORE = 1.0
        ds = MapFreeDataset(cfg, "train")
        assert len(ds) == 9
        cfg.DATASET.MIN_OVERLAP_SCORE = 0.99  # nothing overlaps this much
        ds = MapFreeDataset(cfg, "train")
        assert len(ds) == 0

    def test_sampler_scene_balance(self, fake_dataset):
        cfg = tiny_cfg(fake_dataset)
        ds = MapFreeDataset(cfg, "val")
        s = RandomConcatSampler(ds, n_samples_per_subset=6, subset_replacement=True, seed=1)
        idx = list(iter(s))
        assert len(idx) == 12
        # balanced: 6 from each scene
        assert sum(1 for i in idx if i < 2) == 6

    def test_sampler_reset_on_iter(self, fake_dataset):
        cfg = tiny_cfg(fake_dataset)
        ds = MapFreeDataset(cfg, "val")
        s = RandomConcatSampler(ds, 6, reset_on_iter=True, seed=2)
        assert list(iter(s)) == list(iter(s))
        s2 = RandomConcatSampler(ds, 6, reset_on_iter=False, seed=2)
        assert list(iter(s2)) != list(iter(s2))

    def test_loader_batches(self, fake_dataset):
        cfg = tiny_cfg(fake_dataset)
        loader = DataModule(cfg, drop_last_val=False).val_dataloader()
        batches = list(loader)
        assert sum(b["image0"].shape[0] for b in batches) == 4
        b0 = batches[0]
        assert b0["image0"].shape[1:] == (126, 112, 3)
        assert b0["image0"].dtype == np.float32
        assert isinstance(b0["scene_id"], list)

    def test_loader_native_backend_matches_cv2(self, fake_dataset):
        """Default loader path = native batched ingest; images must agree with
        the cv2-per-sample fallback and all metadata must be identical."""
        from mickey_tpu.data.native import ensure_built

        if ensure_built() is None:
            pytest.skip("native extension unavailable")

        cfg = tiny_cfg(fake_dataset)
        dm = DataModule(cfg, drop_last_val=False)
        native_batches = list(dm.val_dataloader())
        cfg.TRAINING.NATIVE_LOADER = False
        cv2_batches = list(DataModule(cfg, drop_last_val=False).val_dataloader())

        assert len(native_batches) == len(cv2_batches)
        for bn, bc in zip(native_batches, cv2_batches):
            assert np.abs(bn["image0"] - bc["image0"]).mean() < 5e-3
            assert np.abs(bn["image1"] - bc["image1"]).mean() < 5e-3
            np.testing.assert_array_equal(bn["T_0to1"], bc["T_0to1"])
            np.testing.assert_array_equal(bn["K_color0"], bc["K_color0"])
            assert bn["pair_names"] == bc["pair_names"]
            assert bn["scene_id"] == bc["scene_id"]


    def test_loader_rawcache_matches_cv2(self, fake_dataset, tmp_path):
        """Decode-once uint8 raw cache (data/raw_cache.py): batches must be
        bit-identical to the cv2 decode path after device-side normalization,
        ingest as uint8 (4x smaller transfer), and keep all metadata."""
        import shutil

        import jax.numpy as jnp

        from mickey_tpu.data.raw_cache import build_scene_cache
        from mickey_tpu.nn.extractor import normalize_images

        root = tmp_path / "ds"
        shutil.copytree(fake_dataset, root)
        cfg = tiny_cfg(root)
        cfg.TRAINING.NATIVE_LOADER = False
        ref_batches = list(DataModule(cfg, drop_last_val=False).val_dataloader())
        assert ref_batches[0]["image0"].dtype == np.float32

        for scene in sorted((root / "val").iterdir()):
            build_scene_cache(scene, (cfg.DATASET.WIDTH, cfg.DATASET.HEIGHT))
        raw_batches = list(DataModule(cfg, drop_last_val=False).val_dataloader())

        assert len(raw_batches) == len(ref_batches)
        for br, bc in zip(raw_batches, ref_batches):
            assert br["image0"].dtype == np.uint8  # rawcache path taken
            np.testing.assert_array_equal(
                br["image0"].astype(np.float32) / 255.0, bc["image0"]
            )
            np.testing.assert_array_equal(br["T_0to1"], bc["T_0to1"])
            np.testing.assert_array_equal(br["K_color0"], bc["K_color0"])
            assert br["pair_names"] == bc["pair_names"]

        # device-side normalization equals the host /255 (1-ulp reciprocal)
        u8 = jnp.asarray(raw_batches[0]["image0"])
        np.testing.assert_allclose(
            np.asarray(normalize_images(u8)), ref_batches[0]["image0"], atol=1e-6
        )


class TestSubmissionEndToEnd:
    def test_predict_evaluate(self, fake_dataset, tmp_path):
        from mickey_tpu.cli.submission import predict, save_submission
        from mickey_tpu.evaluation import evaluate
        from mickey_tpu.models import build_model

        cfg = tiny_cfg(fake_dataset)
        loader = DataModule(cfg, drop_last_val=False).val_dataloader()
        model = build_model(cfg, checkpoint="")
        results = predict(loader, model, mesh=None, progress=False)
        assert set(results.keys()) == {"s00000", "s00001"}

        zip_path = tmp_path / "submission.zip"
        save_submission(results, zip_path)
        with zipfile.ZipFile(zip_path) as zf:
            names = set(zf.namelist())
        assert names == {"pose_s00000.txt", "pose_s00001.txt"}

        metrics, _ = evaluate(zip_path, Path(fake_dataset) / "val")
        assert "Average Median Translation Error" in metrics
        assert 0 <= metrics["Estimates for % of frames"] <= 1
        assert metrics["Estimates for % of frames"] > 0

    @pytest.mark.parametrize("fused_topk", [False, True])
    def test_predict_shared_ref_matches_plain(self, fake_dataset, fused_topk):
        """The shared-reference serving path (per-scene keyframe extract
        cache, cli/submission.py::predict) must produce IDENTICAL poses to
        recomputing the reference frame every pair: same programs, same
        inputs, same per-step RANSAC keys — only the recomputation is gone.

        Tolerance note: the keyframe extract runs as a B-image program in the
        shared arm vs the 2B-stacked program in the plain arm — low-order-bit
        drift between those two CPU programs is real (observed <= ~1e-7 on
        scores). The dense route is locked at 1e-6; the fused-top-K route's
        descending sort makes sampled-set membership sensitive to those last
        bits near ties, so its lock is 1e-5 (still far below any discrete
        draw flip, which moves poses by >> 1e-3)."""
        from mickey_tpu.cli.submission import predict
        from mickey_tpu.models import build_model

        cfg = tiny_cfg(fake_dataset)
        cfg.TPU.FUSED_TOPK = fused_topk
        atol = 1e-5 if fused_topk else 1e-6
        model = build_model(cfg, checkpoint="")
        loader = DataModule(cfg, drop_last_val=False).val_dataloader()
        r_plain = predict(loader, model, mesh=None, progress=False, shared_ref=False)
        r_shared = predict(loader, model, mesh=None, progress=False, shared_ref=True)

        assert set(r_plain) == set(r_shared)
        for scene in r_plain:
            assert len(r_plain[scene]) == len(r_shared[scene])
            for a, b in zip(r_plain[scene], r_shared[scene]):
                assert a.image_name == b.image_name
                np.testing.assert_allclose(b.q, a.q, atol=atol)
                np.testing.assert_allclose(b.t, a.t, atol=atol)
                np.testing.assert_allclose(b.inliers, a.inliers, rtol=1e-4)

    def test_predict_mesh_shared_ref_matches_plain(self, fake_dataset):
        """The mesh arm of the shared-reference path (sharded keyframe feats
        into shard_mapped per-chip programs) must equal the stacked-pair mesh
        path: same per-shard RANSAC key folds, same math, padded batches."""
        import jax

        from mickey_tpu.cli.submission import predict
        from mickey_tpu.models import build_model
        from mickey_tpu.parallel import get_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")

        cfg = tiny_cfg(fake_dataset)
        model = build_model(cfg, checkpoint="")
        mesh = get_mesh(num_devices=8)
        loader = DataModule(cfg, drop_last_val=False).val_dataloader()
        r_plain = predict(loader, model, mesh=mesh, progress=False, shared_ref=False)
        r_shared = predict(loader, model, mesh=mesh, progress=False, shared_ref=True)

        assert set(r_plain) == set(r_shared)
        # tolerance note: the shared arm extracts refs in a b_pad-image
        # program and queries in a B_local-image program while the plain arm
        # runs one stacked 2*B_local program — different XLA program shapes
        # carry low-order-bit drift (~1e-6 observed on CPU) even though the
        # per-image math is identical; a flipped discrete RANSAC draw would
        # show up orders of magnitude larger than this bound
        for scene in r_plain:
            assert len(r_plain[scene]) == len(r_shared[scene])
            for a, b in zip(r_plain[scene], r_shared[scene]):
                assert a.image_name == b.image_name
                np.testing.assert_allclose(b.q, a.q, atol=1e-5)
                np.testing.assert_allclose(b.t, a.t, atol=1e-5)
                np.testing.assert_allclose(b.inliers, a.inliers, rtol=1e-4)

    def test_predict_mesh_sharded(self, fake_dataset, tmp_path):
        """The actual multi-chip serving path: batches padded to the device
        count and sharded over an 8-device mesh (cli/submission.py mesh arm)."""
        import jax

        from mickey_tpu.cli.submission import predict, save_submission
        from mickey_tpu.evaluation import evaluate
        from mickey_tpu.models import build_model
        from mickey_tpu.parallel import get_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")

        cfg = tiny_cfg(fake_dataset)
        loader = DataModule(cfg, drop_last_val=False).val_dataloader()
        model = build_model(cfg, checkpoint="")
        mesh = get_mesh(num_devices=8)
        results = predict(loader, model, mesh=mesh, progress=False)
        assert set(results.keys()) == {"s00000", "s00001"}

        zip_path = tmp_path / "submission_mesh.zip"
        save_submission(results, zip_path)
        metrics, _ = evaluate(zip_path, Path(fake_dataset) / "val")
        assert metrics["Estimates for % of frames"] > 0


class TestNativeIO:
    def test_native_decode_matches_cv2(self, tmp_path):
        import cv2

        from mickey_tpu.data.native import ensure_built, read_batch

        if ensure_built() is None:
            pytest.skip("native extension unavailable")

        rng = np.random.default_rng(3)
        paths = []
        for i in range(3):
            img = rng.integers(0, 255, (96, 80, 3), dtype=np.uint8)
            p = tmp_path / f"im{i}.jpg"
            cv2.imwrite(str(p), img)
            paths.append(str(p))

        out = read_batch(paths, width=56, height=70, num_threads=2)
        assert out.shape == (3, 70, 56, 3) and out.dtype == np.float32

        for i, p in enumerate(paths):
            ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            ref = cv2.resize(ref, (56, 70)).astype(np.float32) / 255.0
            assert np.abs(out[i] - ref).mean() < 5e-3

    def test_native_corrupt_jpeg_zero_filled(self):
        from mickey_tpu.data.native import decode_resize_batch, ensure_built

        if ensure_built() is None:
            pytest.skip("native extension unavailable")
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            out = decode_resize_batch([b"not a jpeg"], 28, 28, num_threads=1)
        assert out.shape == (1, 28, 28, 3)
        assert (out == 0).all()
