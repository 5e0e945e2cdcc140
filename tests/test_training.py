"""Training loop smoke tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from mickey_tpu.config import default_config


def train_cfg(data_root=None):
    cfg = default_config()
    cfg.MICKEY.DINOV2.VARIANT = "vit_small"
    cfg.MICKEY.DINOV2.CHANNEL_DIM = 384
    cfg.MICKEY.DINOV2.FLOAT16 = False
    cfg.MICKEY.KP_HEADS.BLOCKS_DIM = [32, 16, 128, 8]
    cfg.MICKEY.DSC_HEAD.LAST_DIM = 16
    if data_root is not None:
        cfg.DATASET.DATA_ROOT = str(data_root)
    cfg.DATASET.WIDTH = 112
    cfg.DATASET.HEIGHT = 126
    cfg.TRAINING.BATCH_SIZE = 8
    cfg.TRAINING.NUM_WORKERS = 2
    gh = cfg.LOSS_CLASS.GENERATE_HYPOTHESES
    gh.IT_MATCHES = 2
    gh.IT_RANSAC = 3
    gh.NUM_CORR_3d3d = 5
    gh.NUM_REF_STEPS = 1
    cfg.LOSS_CLASS.SAMPLER.NUM_SAMPLES_MATCHES = 16
    cfg.PROCRUSTES.IT_MATCHES = 2
    cfg.PROCRUSTES.IT_RANSAC = 4
    cfg.PROCRUSTES.NUM_SAMPLED_MATCHES = 12
    cfg.PROCRUSTES.NUM_CORR_3D_3D = 3
    cfg.PROCRUSTES.NUM_REFINEMENTS = 1
    return cfg


def synthetic_batch(rng, B=8, H=126, W=112):
    T = np.zeros((B, 4, 4), np.float32)
    from mickey_tpu.geometry.rotations import quat2mat

    for b in range(B):
        q = rng.normal(size=4)
        T[b, :3, :3] = quat2mat(q / np.linalg.norm(q))
        T[b, :3, 3] = rng.normal(size=3) * 0.3
        T[b, 3, 3] = 1
    K = np.zeros((B, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 100
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = W / 2, H / 2, 1
    return {
        "image0": rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32),
        "image1": rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32),
        "T_0to1": T,
        "K_color0": K,
        "K_color1": K,
        "Kori_color0": K,
        "Kori_color1": K,
    }


class TestTrainer:
    def test_train_steps_update_params(self, rng, tmp_path):
        from mickey_tpu.models.training_model import MicKeyTrainer

        assert len(jax.devices()) == 8, "expected virtual 8-device CPU mesh"
        cfg = train_cfg()
        trainer = MicKeyTrainer(cfg, out_dir=str(tmp_path), seed=0)

        p_before = jax.device_get(trainer.state.params["matcher"]["dustbin_score"])
        det_w_before = np.asarray(
            jax.device_get(trainer.state.params["det_head"]["out"]["w"])
        ).copy()

        m1 = trainer.training_step(synthetic_batch(rng))
        m2 = trainer.training_step(synthetic_batch(rng))
        assert np.isfinite(m1["loss"]) and np.isfinite(m2["loss"])
        assert m1["grads_finite"] == 1.0
        assert m1["num_valid"] == 8

        det_w_after = np.asarray(jax.device_get(trainer.state.params["det_head"]["out"]["w"]))
        assert np.abs(det_w_after - det_w_before).max() > 0, "params did not update"
        assert int(jax.device_get(trainer.state.step)) == 2

    def test_validation_and_aggregation(self, rng, tmp_path):
        from mickey_tpu.models.training_model import MicKeyTrainer

        cfg = train_cfg()
        trainer = MicKeyTrainer(cfg, out_dir=str(tmp_path), seed=1)
        outs = [trainer.validation_step(synthetic_batch(rng, B=4)) for _ in range(2)]
        assert outs[0]["R_err"].shape == (4,)
        agg = trainer.aggregate_validation(outs)
        assert set(agg) >= {
            "val_vcre/auc_vcre",
            "val_AUC_pose/auc_pose",
            "val_AUC_pose/auc_pose_10",
            "val_metric_pose/ours_R_err",
        }
        assert np.isfinite(agg["val_loss/loss"])

    def test_val_cached_matches_plain(self, rng, tmp_path):
        """The cached validation epoch (keyframe feature reuse through
        make_staged_val_step) produces the same metrics as the plain
        re-extract-both-sides val step (reference model.py:66-89)."""
        import jax.numpy as jnp
        from mickey_tpu.models.training_model import MicKeyTrainer

        cfg = train_cfg()
        batch = synthetic_batch(rng, B=4)
        # all four pairs share one scene keyframe as frame0 (the Map-free val
        # layout, reference datasets/mapfree.py:55-58)
        batch["image0"] = np.repeat(batch["image0"][:1], 4, axis=0)
        batch["scene_root"] = ["/data/val/s00000"] * 4
        batch["pair_names"] = [("seq0/frame_00000.jpg", f"seq1/frame_{i:05d}.jpg") for i in range(4)]

        trainer = MicKeyTrainer(cfg, out_dir=str(tmp_path), seed=5)
        assert trainer._cached_val

        trainer.key = jax.random.PRNGKey(7)
        out_cached = trainer.validation_step(batch)
        assert len(trainer._val_kf_cache) == 1  # one shared keyframe extracted once
        trainer.key = jax.random.PRNGKey(7)
        out_cached2 = trainer.validation_step(batch)  # memory-cache hit path

        trainer._cached_val = False
        trainer.key = jax.random.PRNGKey(7)
        out_plain = trainer.validation_step(batch)

        for k in out_plain:
            np.testing.assert_allclose(
                out_cached[k], out_plain[k], rtol=1e-5, atol=1e-5, err_msg=k
            )
            np.testing.assert_allclose(
                out_cached2[k], out_plain[k], rtol=1e-5, atol=1e-5, err_msg=k
            )

    def test_checkpoint_roundtrip(self, rng, tmp_path):
        from mickey_tpu.models.training_model import MicKeyTrainer

        cfg = train_cfg()
        trainer = MicKeyTrainer(cfg, out_dir=str(tmp_path), seed=2)
        trainer.training_step(synthetic_batch(rng))
        trainer.topk = 45.0
        trainer.maybe_checkpoint({"val_vcre/auc_vcre": 0.5, "val_AUC_pose/auc_pose": 0.5}, epoch=3)

        trainer2 = MicKeyTrainer(cfg, out_dir=str(tmp_path), seed=99)
        epoch = trainer2.resume(str(tmp_path / "last"))
        assert epoch == 3
        assert trainer2.topk == 45.0
        assert trainer2.global_step == 1
        a = jax.device_get(trainer.state.params["det_head"]["out"]["w"])
        b = jax.device_get(trainer2.state.params["det_head"]["out"]["w"])
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_curriculum_advances(self, tmp_path):
        from mickey_tpu.models.training_model import MicKeyTrainer

        cfg = train_cfg()
        trainer = MicKeyTrainer(cfg, out_dir=str(tmp_path), seed=3)
        assert trainer.topk == 30.0
        for _ in range(12):
            trainer.on_train_epoch_end()
        assert trainer.topk == 80.0

    def test_bn_stats_updated_in_train_not_eval(self, rng, tmp_path):
        from mickey_tpu.models.training_model import MicKeyTrainer

        cfg = train_cfg()
        trainer = MicKeyTrainer(cfg, out_dir=str(tmp_path), seed=4)
        stats_before = np.asarray(
            jax.device_get(trainer.state.params["det_head"]["resblock1"]["bn1"]["mean"])
        ).copy()
        trainer.training_step(synthetic_batch(rng))
        stats_after = np.asarray(
            jax.device_get(trainer.state.params["det_head"]["resblock1"]["bn1"]["mean"])
        )
        assert np.abs(stats_after - stats_before).max() > 0, "BN stats did not advance"
        # validation must not change them
        trainer.validation_step(synthetic_batch(rng, B=4))
        stats_after2 = np.asarray(
            jax.device_get(trainer.state.params["det_head"]["resblock1"]["bn1"]["mean"])
        )
        np.testing.assert_array_equal(stats_after, stats_after2)


class TestFitLoop:
    def test_fit_one_epoch_synthetic_dataset(self, tmp_path, monkeypatch):
        """Full fit(): train epoch + validation + checkpointing on the
        synthetic Map-free dataset (exercises the train CLI path)."""
        import cv2

        from mickey_tpu.data.loader import DataModuleTraining
        from mickey_tpu.geometry.rotations import quat2mat
        from mickey_tpu.models.training_model import MicKeyTrainer

        rng = np.random.default_rng(0)
        root = tmp_path / "data"
        for split, scene in (("train", "s0"), ("val", "s1")):
            sdir = root / split / scene
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
            if split == "train":
                idxs = np.array([[1, i, 1, i + 1] for i in range(5)], dtype=np.uint16)
                np.savez(sdir / "overlaps.npz", idxs=idxs, overlaps=np.full(5, 0.5))

        cfg = train_cfg(root)
        cfg.DATASET.MIN_OVERLAP_SCORE = 0.0
        cfg.DATASET.MAX_OVERLAP_SCORE = 1.0
        cfg.TRAINING.BATCH_SIZE = 8
        cfg.TRAINING.N_SAMPLES_SCENE = 8
        cfg.TRAINING.LOG_INTERVAL = 1
        cfg.TRAINING.EPOCHS = 1
        cfg.TRAINING.VAL_BATCHES = 1
        cfg.TPU.LOG_IMAGES = True  # exercise the TB image panels

        out_dir = tmp_path / "run"
        trainer = MicKeyTrainer(cfg, out_dir=str(out_dir), seed=0)
        logged = {}
        orig_log = trainer.log_scalar
        trainer.log_scalar = lambda name, value, step=None: (
            logged.__setitem__(name, float(value)), orig_log(name, value, step)
        )[1]
        dm = DataModuleTraining(cfg)
        trainer.fit(dm, max_epochs=1, val_batches=1, log_interval=1)

        assert trainer.global_step >= 1
        assert (out_dir / "last").exists()
        assert trainer.topk == 35.0  # curriculum advanced once
        # LR scalar logged (reference LearningRateMonitor, train.py:57)
        assert logged.get("train/lr") == pytest.approx(cfg.TRAINING.LR)


class TestCurriculumMaskEdge:
    def _loss_inputs(self, B=4, N=16):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        K = np.zeros((B, 3, 3), np.float32)
        K[:, 0, 0] = K[:, 1, 1] = 100.0
        K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = 56.0, 63.0, 1.0
        T = synthetic_batch(rng, B=B)["T_0to1"]
        return dict(
            final_scores=jnp.asarray(rng.uniform(0.01, 1.0, (B, N, N)).astype(np.float32)),
            kps0=jnp.asarray(rng.uniform(0, 100, (B, N, 2)).astype(np.float32)),
            depth0=jnp.asarray(rng.uniform(1, 5, (B, N, 1)).astype(np.float32)),
            kps1=jnp.asarray(rng.uniform(0, 100, (B, N, 2)).astype(np.float32)),
            depth1=jnp.asarray(rng.uniform(1, 5, (B, N, 1)).astype(np.float32)),
            K0=jnp.asarray(K), K1=jnp.asarray(K),
            K0ori=jnp.asarray(K), K1ori=jnp.asarray(K),
            Rgt=jnp.asarray(T[:, :3, :3]),
            tgt=jnp.asarray(T[:, :3, 3][:, None, :]),
        )

    def test_topk_pct_100_means_no_masking(self):
        """topk_pct >= 100 must yield the all-ones mask: validation passes
        100.0 meaning 'no masking', and the sb clip to B-1 used to silently
        mask the single worst pair (round-3 VERDICT weak #4)."""
        import jax.numpy as jnp

        from mickey_tpu.training.loss import LossConfig, metric_pose_loss

        lc = LossConfig(
            it_matches=2, it_ransac=2, num_corr=3, num_samples_matches=8,
            num_ref_steps=1, train_with_topk=True,
        )
        inputs = self._loss_inputs()
        key = jax.random.PRNGKey(0)
        _, aux100 = metric_pose_loss(**inputs, key=key, lc=lc, topk_pct=jnp.float32(100.0))
        np.testing.assert_array_equal(np.asarray(aux100["mask_topk"]), np.ones(4))
        # and a real curriculum percentage still masks: 50% of B=4 keeps 2
        _, aux50 = metric_pose_loss(**inputs, key=key, lc=lc, topk_pct=jnp.float32(50.0))
        assert np.asarray(aux50["mask_topk"]).sum() == 2.0


class TestDinov2Bootstrap:
    """resolve_dinov2_weights mirrors the reference's auto-download bootstrap
    (mickey_extractor.py:14-17) with graceful zero-egress fallback."""

    def test_explicit_path_wins(self, tmp_path):
        from mickey_tpu.training.checkpoint import resolve_dinov2_weights

        f = tmp_path / "dinov2_vitl14_pretrain.pth"
        f.write_bytes(b"stub")
        assert resolve_dinov2_weights(str(f), download=False) == str(f)

    def test_env_var_resolution(self, tmp_path, monkeypatch):
        from mickey_tpu.training.checkpoint import resolve_dinov2_weights

        f = tmp_path / "w.pth"
        f.write_bytes(b"stub")
        monkeypatch.setenv("MICKEY_DINOV2_PATH", str(f))
        assert resolve_dinov2_weights(download=False) == str(f)

    def test_missing_returns_none_without_network(self, monkeypatch):
        from mickey_tpu.training.checkpoint import resolve_dinov2_weights

        monkeypatch.delenv("MICKEY_DINOV2_PATH", raising=False)
        monkeypatch.setenv("MICKEY_NO_DOWNLOAD", "1")
        assert resolve_dinov2_weights(download=True) is None


class TestStagedTrainStep:
    def test_staged_matches_monolith(self):
        """make_staged_train_step == make_train_step exactly: the split is at
        a stop_gradient boundary, so params, opt state, BN stats and metrics
        must agree to fp tolerance after a step (and exactly in structure)."""
        import jax.numpy as jnp

        from mickey_tpu.nn.extractor import model_init
        from mickey_tpu.training.train_step import (
            init_train_state,
            make_staged_train_step,
            make_train_step,
        )

        cfg = train_cfg()
        rng = np.random.default_rng(0)
        batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, B=2).items()}
        params = model_init(jax.random.PRNGKey(0), cfg)
        key = jax.random.PRNGKey(7)
        topk = jnp.float32(80.0)

        outs = {}
        for name, make in (("mono", make_train_step), ("staged", make_staged_train_step)):
            # fresh buffers per variant: the steps donate their state arg
            fresh = jax.tree_util.tree_map(jnp.array, params)
            state, backbone = init_train_state(cfg, fresh)
            step = make(cfg)
            state, metrics = step(state, backbone, batch, key, topk)
            state, metrics = step(state, backbone, batch, key, topk)
            outs[name] = (state, metrics)

        sm, mm = outs["staged"][1], outs["mono"][1]
        assert float(mm["grads_finite"]) == 1.0
        np.testing.assert_allclose(float(sm["loss"]), float(mm["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            float(sm["grad_norm"]), float(mm["grad_norm"]), rtol=1e-4
        )
        flat_s = jax.tree_util.tree_leaves(outs["staged"][0].params)
        flat_m = jax.tree_util.tree_leaves(outs["mono"][0].params)
        assert len(flat_s) == len(flat_m)
        for a, b in zip(flat_s, flat_m):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)

    def test_fused_topk_route_matches_monolith(self):
        """TPU.TRAIN_FUSED_TOPK: the fused matcher->top-K training route
        (loss samples from the top-P table, log final scores reconstructed
        from grad-carrying logsumexps — no dense match matrix) must run
        finite on the CPU fallback, update params, and agree between the
        staged and monolithic step builders exactly like the dense route.
        Gradient equivalence with the dense route itself is locked at the
        loss level (test_fused_matcher.py::test_loss_topk_grad_matches_dense;
        the routes sample from different-but-matching distributions, so
        whole-step equality only holds with injected samples)."""
        import jax.numpy as jnp

        from mickey_tpu.nn.extractor import model_init
        from mickey_tpu.training.train_step import (
            init_train_state,
            make_staged_train_step,
            make_train_step,
        )

        cfg = train_cfg()
        cfg.TPU.TRAIN_FUSED_TOPK = True
        cfg.TPU.SAMPLING_PREFILTER = 64
        rng = np.random.default_rng(0)
        batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, B=2).items()}
        params = model_init(jax.random.PRNGKey(0), cfg)
        key = jax.random.PRNGKey(7)
        topk = jnp.float32(80.0)

        outs = {}
        for name, make in (("mono", make_train_step), ("staged", make_staged_train_step)):
            fresh = jax.tree_util.tree_map(jnp.array, params)
            state, backbone = init_train_state(cfg, fresh)
            step = make(cfg)
            state, metrics = step(state, backbone, batch, key, topk)
            state, metrics = step(state, backbone, batch, key, topk)
            outs[name] = (state, metrics)

        sm, mm = outs["staged"][1], outs["mono"][1]
        assert float(mm["grads_finite"]) == 1.0
        assert np.isfinite(float(mm["loss"]))
        np.testing.assert_allclose(float(sm["loss"]), float(mm["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            float(sm["grad_norm"]), float(mm["grad_norm"]), rtol=1e-4
        )
        # params actually moved (the optimizer applied a finite update)
        before = np.asarray(params["matcher"]["dustbin_score"])
        after = np.asarray(outs["staged"][0].params["matcher"]["dustbin_score"])
        assert not np.allclose(before, after)
        for a, b in zip(
            jax.tree_util.tree_leaves(outs["staged"][0].params),
            jax.tree_util.tree_leaves(outs["mono"][0].params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)
